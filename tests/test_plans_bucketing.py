"""Bucketed-layout plan assertions: co-located joins read their
partitioning off disk — zero exchanges on either side."""

from __future__ import annotations

import pytest
from conftest import SF_ORACLE

from pyspark.sql import functions as F

from spark_deal_observer_spark.plans.deals import deals_df
from spark_deal_observer_spark.sources.bucketing import (
    colocated_merge_plan,
    write_bucketed,
)


@pytest.fixture()
def bucketed_tables(spark):
    deals = deals_df(spark, SF_ORACLE).select("id", "miner_id", "piece_cid", "payload_cid")
    updates = deals.where(F.col("id") % 7 == 0).select(
        "id", F.lit("bafyNEW").alias("new_payload")
    )
    write_bucketed(deals, "t_deals_bucketed", ["id"], num_buckets=8)
    write_bucketed(updates, "t_updates_bucketed", ["id"], num_buckets=8)
    yield "t_deals_bucketed", "t_updates_bucketed"
    spark.sql("DROP TABLE IF EXISTS t_deals_bucketed")
    spark.sql("DROP TABLE IF EXISTS t_updates_bucketed")


def test_colocated_join_has_no_exchange(spark, bucketed_tables):
    base, updates = bucketed_tables
    threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # surface the SMJ
    try:
        df = colocated_merge_plan(spark, base, updates, ["id"])
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan
        assert "Bucketed: true" in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)


def test_colocated_join_values_match_plain_join(spark, bucketed_tables):
    base, updates = bucketed_tables
    merged = colocated_merge_plan(spark, base, updates, ["id"])
    n_updates = spark.table(updates).count()
    assert merged.where(F.col("new_payload").isNotNull()).count() == n_updates
    assert merged.count() == spark.table(base).count()
