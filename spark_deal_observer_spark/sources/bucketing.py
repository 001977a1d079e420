"""Bucketed-table layout: pre-shuffled storage for co-located joins.

The reference's physical design is indexes on the hot keys
(db/migrations/004,007,010,013,014,015). The Spark-native analog for the
JOIN side of that story is bucketing: write the table hash-partitioned by
the join key into N buckets, and every subsequent equi-join or aggregation
on that key reads the partitioning off disk instead of shuffling — the
exchange disappears from the plan (tests/test_plans_bucketing.py asserts
exactly that).

At 100 TB this is the difference between a merge that moves the whole deal
table per micro-batch and one that only sorts within already-co-located
buckets: ingest (dedup anti-join on the key), enrichment (merge on id), and
egress (mark-submitted semi-join on id) all hit the same bucketed layout.

Bucketed tables need the session catalog (`saveAsTable`) — plain
`.parquet(path)` writes carry no bucket metadata.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

DEFAULT_BUCKETS = 32


def write_bucketed(
    df: DataFrame,
    table: str,
    key: Sequence[str],
    num_buckets: int = DEFAULT_BUCKETS,
) -> None:
    """Persist `df` hash-bucketed (and sorted) by `key`.

    Bucket count is a layout constant: both sides of a co-located join must
    agree on it, so changing it is a table rewrite — pick the number of
    parallel merge tasks you want at target scale, not the current size."""
    (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(num_buckets, *key)
        .sortBy(*key)
        .saveAsTable(table)
    )


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def colocated_merge_plan(spark: SparkSession, base_table: str, updates_table: str, key: Sequence[str]) -> DataFrame:
    """The S7-style merge join over two same-bucketed tables.

    With both inputs bucketed on `key`, Catalyst plans a SortMergeJoin whose
    children are bare bucketed scans — no Exchange on either side."""
    base = read_bucketed(spark, base_table)
    updates = read_bucketed(spark, updates_table)
    return base.join(updates, on=list(key), how="left")
