"""Skew-spreading aggregation patterns.

Plain COUNT/SUM group-bys don't skew in Spark — map-side partial combine
reduces every task's contribution to one row per key before the shuffle.
The shapes that DO skew are the ones partial combine can't compress:
DISTINCT-style aggregates, where every task must ship its full value set
for hot keys to a single reducer.

`salted_distinct_count` is the standard fix, expressed declaratively: salt
by a hash of the DISTINCT column itself, so equal values land in the same
(key, salt) cell — per-cell distinct counts are then disjoint and their sum
is the exact answer. The hot key's value set spreads over `buckets`
reducers instead of one. Both stages are ordinary hash aggregates; AQE can
still coalesce the second (tiny) shuffle.

The salt must be a function of the distinct column (NOT rand()): that is
what makes the per-salt sets disjoint and the result exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_equi_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where the BIG side's key is skewed and the small side is
    too large to broadcast: replicate each small-side row across `n_salts`
    salt values, salt the big side deterministically by a hash of a
    row-identity expression, and join on (key, salt) — a hot key's rows
    spread over `n_salts` reducers instead of one.

    The salt on the big side is a hash of the whole row (xxhash64 of all
    columns), NOT rand(): deterministic under retries/speculative tasks,
    which rand() is not (a retried task re-drawing salts under AQE is a
    correctness bug, not just noise). Result set is provably identical to
    the plain join: every big row meets every matching small row exactly
    once (the small side carries each salt value exactly once).

    AQE's skew-join split solves the same problem adaptively when stats
    surface the skew; this is the explicit form for when you know the key
    distribution ahead of time (or the engine's stats don't)."""
    salt_col = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salts))
    big_s = big.withColumn("_salt", salt_col)
    salts = F.explode(F.array(*[F.lit(i) for i in range(n_salts)])).alias("_salt")
    small_s = small.select("*", salts)
    joined = big_s.join(small_s, on=[key, "_salt"], how=how)
    return joined.drop("_salt")


def salted_distinct_count(
    df: DataFrame,
    group_col: str,
    distinct_col: str,
    alias: str,
    buckets: int = 32,
) -> DataFrame:
    """Exact per-group COUNT(DISTINCT distinct_col), skew-spread over `buckets`."""
    salt = F.pmod(F.xxhash64(F.col(distinct_col)), F.lit(buckets)).alias("_salt")
    per_cell = (
        df.select(group_col, distinct_col)
        .groupBy(group_col, salt)
        .agg(F.count_distinct(F.col(distinct_col)).alias("_d"))
    )
    return per_cell.groupBy(group_col).agg(F.sum("_d").cast("bigint").alias(alias))


def join_key_skew_report(events: DataFrame, key: str = "user_id", top_n: int = 15) -> DataFrame:
    """(key_value, cnt, share, x_avg): the heaviest join/group keys with
    their corpus share and multiple-of-average — the diagnosis report a
    pipeline runs BEFORE choosing salting/AQE-skew-join mitigations (the
    measured companion of `salted_equi_join`; SCALE.md's rule is measure
    bucket skew before trusting any uniformity argument).

    One map-side-combined groupBy + a broadcast 1-row scalar join +
    TakeOrdered: at 100 TB the reduce side is |keys|-bounded and the
    report never materializes more than top_n rows."""
    counts = events.groupBy(key).agg(F.count("*").cast("bigint").alias("cnt"))
    tot = counts.agg(
        F.sum("cnt").cast("double").alias("_tot"),
        F.avg("cnt").alias("_avg"),
    )
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            F.col(key).cast("string").alias("key_value"),
            "cnt",
            F.round(F.col("cnt") / F.col("_tot"), 6).alias("share"),
            F.round(F.col("cnt") / F.col("_avg"), 6).alias("x_avg"),
        )
        .orderBy(F.col("cnt").desc(), F.col("key_value"))
        .limit(top_n)
    )


def join_key_skew_report_oracle(key: str = "user_id", top_n: int = 15) -> str:
    return f"""
        WITH counts AS (SELECT CAST({key} AS VARCHAR) AS key_value,
                               CAST(count(*) AS BIGINT) AS cnt
                        FROM events GROUP BY {key}),
        tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS _tot, avg(cnt) AS _avg
                FROM counts)
        SELECT c.key_value, c.cnt,
               ROUND(c.cnt / t._tot, 6) AS share,
               ROUND(c.cnt / t._avg, 6) AS x_avg
        FROM counts c CROSS JOIN tot t
        ORDER BY c.cnt DESC, c.key_value LIMIT {top_n}
    """
