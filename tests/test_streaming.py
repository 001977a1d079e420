"""Streaming ingest + egress semantics: checkpoint resume (T3), in-flight and
cross-batch dedup (T6), bounded egress batches with partial failure (T7)."""

from __future__ import annotations

import datetime as dt

import pytest
from conftest import SF_SMALL

from pyspark.sql import functions as F

from spark_deal_observer_spark.operators.merge import DEAL_KEY
from spark_deal_observer_spark.plans.deals import REF_TS, deals_df
from spark_deal_observer_spark.sources.tables import load_table
from spark_deal_observer_spark.streaming.egress import submit_eligible
from spark_deal_observer_spark.streaming.ingest import start_ingest
from spark_deal_observer_spark.streaming.sink import DealTableSink


@pytest.fixture()
def dirs(tmp_path):
    return {
        "source": str(tmp_path / "source"),
        "table": str(tmp_path / "table"),
        "ckpt": str(tmp_path / "ckpt"),
    }


def _drain(q):
    q.awaitTermination(120)


def test_ingest_end_to_end_idempotent(spark, dirs):
    events = load_table(spark, SF_SMALL, "events")
    events.write.mode("overwrite").parquet(dirs["source"])
    n_keys = deals_df(spark, SF_SMALL).select(*DEAL_KEY).dropDuplicates().count()

    q = start_ingest(
        spark, dirs["source"], dirs["table"], dirs["ckpt"],
        available_now=True, max_files_per_trigger=1,
    )
    _drain(q)
    sink = DealTableSink(spark, dirs["table"])
    first = sink.count()
    assert first == n_keys

    # restart with the same checkpoint: nothing new to process
    q = start_ingest(
        spark, dirs["source"], dirs["table"], dirs["ckpt"], available_now=True
    )
    _drain(q)
    assert sink.count() == first

    # replay the same events as new files: checkpoint sees new files, but the
    # keyed anti-join sink drops every row — effectively-once
    events.write.mode("append").parquet(dirs["source"])
    q = start_ingest(
        spark, dirs["source"], dirs["table"], dirs["ckpt"], available_now=True
    )
    _drain(q)
    assert sink.count() == first


def test_egress_partial_failure_then_retry(spark, dirs):
    deals = deals_df(spark, SF_SMALL)
    sink = DealTableSink(spark, dirs["table"])
    sink.append_dedup(deals)
    stored = sink.count()

    calls = []

    def flaky_poster(payload):
        calls.append(len(payload))
        if len(calls) == 2:
            raise ConnectionError("spark-api 500")
        return {"ingested": len(payload), "skipped": 0}

    now = F.lit(REF_TS).cast("timestamp_ntz")
    res1 = submit_eligible(sink, flaky_poster, now=now)
    n_eligible = sum(calls)
    assert res1["submitted"] == n_eligible - calls[1]  # failed batch skipped
    assert sink.count() == stored  # merge rewrites, never grows

    # next tick retries only the failed batch's deals
    calls2 = []

    def ok_poster(payload):
        calls2.append(len(payload))
        return {"ingested": len(payload), "skipped": 0}

    res2 = submit_eligible(sink, ok_poster, now=now)
    assert res2["submitted"] == calls[1]
    assert sum(calls2) == calls[1]

    # third tick: nothing left
    res3 = submit_eligible(sink, ok_poster, now=now)
    assert res3["submitted"] == 0


def test_egress_marks_submitted_at(spark, dirs):
    deals = deals_df(spark, SF_SMALL)
    sink = DealTableSink(spark, dirs["table"])
    sink.append_dedup(deals)
    now = F.lit(REF_TS).cast("timestamp_ntz")
    res = submit_eligible(sink, lambda p: {"ingested": len(p)}, now=now)
    marked = sink.read().where(
        F.col("submitted_at") == F.lit(REF_TS).cast("timestamp_ntz")
    )
    assert marked.count() == res["submitted"]
    assert res["ingested"] == res["submitted"]
