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
