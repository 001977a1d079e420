"""Catalog deal sink: partitioned + bucketed layout — partition-scoped
merges via dynamic overwrite, co-located id-joins with zero exchanges."""

from __future__ import annotations

import os

import pytest
from conftest import SF_SMALL
from pyspark.sql import functions as F

from spark_deal_observer_spark.plans.deals import REF_TS, deals_df
from spark_deal_observer_spark.streaming.catalog_sink import PCOL, CatalogDealTableSink
from spark_deal_observer_spark.streaming.egress import submit_eligible


@pytest.fixture()
def sink(spark):
    s = CatalogDealTableSink(spark, table="deal_observer.active_deals_test")
    s.drop()
    yield s
    s.drop()


def _files(path: str) -> dict[str, set[str]]:
    out: dict[str, set[str]] = {}
    for root, _, files in os.walk(path):
        part = os.path.relpath(root, path)
        names = {f for f in files if f.endswith(".parquet")}
        if names and part.startswith(f"{PCOL}="):
            out[part] = names
    return out


def test_append_dedup_idempotent_and_bucketed(spark, sink):
    deals = deals_df(spark, SF_SMALL)
    sink.append_dedup(deals)
    n = sink.count()
    assert n == deals.select(*sink.key).dropDuplicates().count()
    sink.append_dedup(deals)  # replay: ON CONFLICT DO NOTHING
    assert sink.count() == n

    info = {
        r.col_name: r.data_type
        for r in spark.sql(f"DESCRIBE TABLE EXTENDED {sink.table}").collect()
    }
    assert info.get("Num Buckets") == str(sink.n_buckets)
    assert "id" in info.get("Bucket Columns", "")


def test_merge_overwrites_only_touched_partitions(spark, sink):
    deals = deals_df(spark, SF_SMALL)
    sink.append_dedup(deals)
    loc = sink.location()
    before = _files(loc)
    assert len(before) > 2

    now = F.lit(REF_TS).cast("timestamp_ntz")
    updates = (
        sink.read().where(F.col("activated_at_epoch") < 4622200)
        .withColumn("submitted_at", now)
        .localCheckpoint()
    )
    n_updates = updates.count()
    sink.merge_overwrite(updates, ["id"])

    after = _files(loc)
    assert set(after) == set(before)
    touched = {p for p in before if int(p.split("=")[1]) < 4622200 // sink.bucket_width}
    for part in before:
        if part in touched:
            assert after[part] != before[part], f"{part} should be rewritten"
        else:
            assert after[part] == before[part], f"{part} must be untouched"
    assert sink.read().where(F.col("submitted_at") == now).count() >= n_updates > 0


def test_bucketed_id_join_has_no_exchange_on_table_side(spark, sink):
    """The point of CLUSTERED BY (id): a same-bucketed staging table joins
    on id with zero exchanges — the 100 TB merge never reshuffles the
    stored table."""
    deals = deals_df(spark, SF_SMALL)
    sink.append_dedup(deals)
    staging = "deal_observer.updates_staging_test"
    spark.sql(f"DROP TABLE IF EXISTS {staging}")
    try:
        (
            sink.read_bucketed()
            .where(F.col("activated_at_epoch") < 4622300)
            .write.format("parquet")
            .bucketBy(sink.n_buckets, "id")
            .sortBy("id")
            .saveAsTable(staging)
        )
        # hint("merge") models the 100 TB case where the updates side is too
        # big to broadcast — at this SF Catalyst would broadcast it (also
        # exchange-free, but not the layout under test)
        joined = sink.read_bucketed().join(
            spark.table(staging).select("id", "submitted_at").hint("merge"),
            "id",
            "left_semi",
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {staging}")


def test_egress_with_catalog_sink(spark, sink):
    deals = deals_df(spark, SF_SMALL)
    sink.append_dedup(deals)
    stored = sink.count()
    now = F.lit(REF_TS).cast("timestamp_ntz")
    res = submit_eligible(sink, lambda p: {"ingested": len(p)}, now=now)
    assert res["submitted"] > 0
    assert sink.count() == stored
    assert submit_eligible(sink, lambda p: {"ingested": len(p)}, now=now)["submitted"] == 0
