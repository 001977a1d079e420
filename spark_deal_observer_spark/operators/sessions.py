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
