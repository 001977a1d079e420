"""Sessionization: group an event stream into per-user sessions separated
by inactivity gaps.

Batch form: the gaps-and-islands idiom — flag rows whose gap from the
previous event exceeds the threshold, running-sum the flags into a session
number, aggregate per (user, session). Two window passes over one
partitioning (user_id) → a single shuffle; the flag and the running sum
share the same sort, so Spark evaluates both in one Window physical node.

Time math is exact interval comparison (`ts > prev + INTERVAL n SECOND`)
on wall-clock TIMESTAMP_NTZ — never `unix_timestamp()` (whose NTZ
interpretation depends on the session timezone) and never second-counting
diffs (Spark's timestampdiff truncates elapsed time, DuckDB's date_diff
counts boundary crossings: they disagree on sub-second gaps).

Streaming form: Spark's native `session_window(ts, gap)` aggregation with a
watermark — tested in tests/test_streaming_sessions.py; the batch query
below is its oracle-checkable twin (identical session boundaries for batch
data)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

DEFAULT_GAP_SECONDS = 1800


def sessionize(events: DataFrame, gap_seconds: int = DEFAULT_GAP_SECONDS) -> DataFrame:
    """(user_id, session_n, n_events, session_start, session_end) per
    inactivity-gap session. Deterministic ordering ties on event_id."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    is_new = F.when(
        prev_ts.isNull()
        | F.expr(f"ts > _prev_ts + INTERVAL {gap_seconds} SECOND"),
        1,
    ).otherwise(0)
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        events.select("user_id", "ts", "event_id")
        .withColumn("_prev_ts", prev_ts)
        .withColumn("_new", is_new)
        .withColumn("session_n", F.sum("_new").over(run).cast("int"))
        .groupBy("user_id", "session_n")
        .agg(
            F.count("*").cast("int").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
    )


def sessionize_oracle(gap_seconds: int = DEFAULT_GAP_SECONDS) -> str:
    return f"""
        WITH x AS (
          SELECT user_id, ts, event_id,
                 CASE WHEN lag(ts) OVER w IS NULL
                        OR ts > lag(ts) OVER w + INTERVAL {gap_seconds} SECOND
                      THEN 1 ELSE 0 END AS is_new
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        s AS (
          SELECT user_id, ts,
                 SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_n
          FROM x)
        SELECT user_id, CAST(session_n AS INT) AS session_n,
               CAST(count(*) AS INT) AS n_events,
               min(ts) AS session_start, max(ts) AS session_end
        FROM s GROUP BY user_id, session_n
    """


# -- funnel analysis ---------------------------------------------------------

FUNNEL_STEPS: tuple[str, ...] = ("view", "click", "purchase")
FUNNEL_WINDOW_HOURS = 24


def funnel_conversion(
    events: DataFrame,
    steps: tuple[str, ...] = FUNNEL_STEPS,
    window_hours: int = FUNNEL_WINDOW_HOURS,
) -> DataFrame:
    """Ordered funnel over the event stream: (step_n, step, n_users) —
    users whose EARLIEST qualifying step-i event falls after their step-
    (i−1) event and within `window_hours` of it. The product-analytics
    staple (view → click → purchase), expressed as a ladder of
    min-timestamp joins.

    Scale shape: each rung is one filtered (user_id) aggregate (map-side
    combined min) plus an equi-join on user_id against the previous rung's
    per-user row — per-user state never exceeds one timestamp per rung, no
    window over the raw stream, no event-level self-join. Interval math is
    wall-clock NTZ, same discipline as sessionize."""
    # (Predicates/aggregates as parsed SQL strings — the r9 py4j-chatter
    # rule; identical analyzed trees.)
    prev = None
    counts = []
    for i, step in enumerate(steps):
        ev = events.where(f"event_type = '{step}'").select("user_id", "ts")
        if prev is None:
            cur = ev.groupBy("user_id").agg(F.expr("min(ts)").alias("t"))
        else:
            cur = (
                ev.join(prev.selectExpr("user_id", "t AS t_prev"), "user_id")
                .where(
                    f"ts > t_prev AND ts <= t_prev + INTERVAL {window_hours} HOUR"
                )
                .groupBy("user_id")
                .agg(F.expr("min(ts)").alias("t"))
            )
        counts.append(
            cur.agg(
                F.expr(f"{i + 1}").alias("step_n"),
                F.expr(f"'{step}'").alias("step"),
                F.expr("CAST(count(*) AS BIGINT)").alias("n_users"),
            )
        )
        prev = cur
    out = counts[0]
    for c in counts[1:]:
        out = out.unionAll(c)
    return out


def funnel_conversion_oracle(
    steps: tuple[str, ...] = FUNNEL_STEPS,
    window_hours: int = FUNNEL_WINDOW_HOURS,
) -> str:
    parts = [
        f"""s0 AS (SELECT user_id, min(ts) AS t FROM events
             WHERE event_type = '{steps[0]}' GROUP BY user_id)"""
    ]
    for i, step in enumerate(steps[1:], start=1):
        parts.append(
            f"""s{i} AS (
              SELECT e.user_id, min(e.ts) AS t
              FROM events e JOIN s{i - 1} p USING (user_id)
              WHERE e.event_type = '{step}' AND e.ts > p.t
                AND e.ts <= p.t + INTERVAL {window_hours} HOUR
              GROUP BY e.user_id)"""
        )
    selects = " UNION ALL ".join(
        f"SELECT {i + 1} AS step_n, '{s}' AS step, "
        f"CAST(count(*) AS BIGINT) AS n_users FROM s{i}"
        for i, s in enumerate(steps)
    )
    return f"WITH {', '.join(parts)} {selects}"


# -- cohort retention --------------------------------------------------------


def cohort_retention(events: DataFrame) -> DataFrame:
    """(cohort_day, day_offset, n_users): users grouped by the day of
    their first event; how many were active again `day_offset` days later
    — the retention triangle every growth/engagement report is built on.

    Scale shape: first-touch is one (user_id) min-aggregate; daily
    activity is a distinct over (user_id, day) — both map-side combined;
    the join is user-keyed; the final count groups ~cohorts×days rows.
    Day truncation is `trunc_ntz` (pure NTZ arithmetic — Spark's
    date_trunc would coerce through the session timezone and shift
    buckets off-UTC; the TZ probe catches exactly this class)."""
    from ..functions.epoch import trunc_ntz

    first = events.groupBy("user_id").agg(
        trunc_ntz("day", F.min("ts")).alias("cohort_day")
    )
    active = events.select(
        "user_id", trunc_ntz("day", F.col("ts")).alias("day")
    ).distinct()
    return (
        active.join(first, "user_id")
        .select(
            "cohort_day",
            F.timestamp_diff("DAY", F.col("cohort_day"), F.col("day"))
            .cast("int")
            .alias("day_offset"),
            "user_id",
        )
        .groupBy("cohort_day", "day_offset")
        .agg(F.count_distinct("user_id").cast("bigint").alias("n_users"))
    )


def cohort_retention_oracle() -> str:
    return """
        WITH first_t AS (
          SELECT user_id, CAST(date_trunc('day', min(ts)) AS TIMESTAMP)
                   AS cohort_day
          FROM events GROUP BY user_id),
        active AS (
          SELECT DISTINCT user_id,
                 CAST(date_trunc('day', ts) AS TIMESTAMP) AS day
          FROM events)
        SELECT f.cohort_day,
               CAST(date_diff('day', f.cohort_day, a.day) AS INT) AS day_offset,
               CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_users
        FROM active a JOIN first_t f USING (user_id)
        GROUP BY f.cohort_day, day_offset
    """


def event_transition_matrix(events: DataFrame) -> DataFrame:
    """(prev_type, next_type, n, p): the Markov transition matrix between
    consecutive event types per user — the general path-analysis form of
    the ordered funnel (every pair, not a fixed ladder), the input to
    next-action models and journey analysis.

    One per-user window (lag over (user_id) ordered by ts with event_id
    tiebreak — per-user state, never a stream self-join), one
    (prev, next) aggregate whose reduce side is |types|² rows, and a
    broadcast per-prev total for the row-normalized probability.
    ROUND(6) on p for cross-engine division parity."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        events.select(
            "user_id",
            "ts",
            "event_id",
            F.lag("event_type").over(w).alias("prev_type"),
            F.col("event_type").alias("next_type"),
        )
        .where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    totals = pairs.groupBy("prev_type").agg(F.sum("n").alias("tot"))
    return (
        pairs.join(F.broadcast(totals), "prev_type")
        .select(
            "prev_type",
            "next_type",
            "n",
            F.round(F.col("n") / F.col("tot"), 6).alias("p"),
        )
    )


def event_transition_matrix_oracle() -> str:
    return """
        WITH pairs AS (
          SELECT lag(event_type) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS prev_type,
                 event_type AS next_type
          FROM events),
        counts AS (SELECT prev_type, next_type,
                          CAST(count(*) AS BIGINT) AS n
                   FROM pairs WHERE prev_type IS NOT NULL
                   GROUP BY prev_type, next_type),
        totals AS (SELECT prev_type, sum(n) AS tot
                   FROM counts GROUP BY prev_type)
        SELECT c.prev_type, c.next_type, c.n,
               ROUND(c.n / t.tot, 6) AS p
        FROM counts c JOIN totals t USING (prev_type)
    """
