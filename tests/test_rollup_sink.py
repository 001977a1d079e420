"""Incremental hourly-rollup maintenance (streaming/rollup_sink.py):
merged partials equal a full recompute, ticks touch only their day
partitions, and batch replay cannot double counters."""

from __future__ import annotations

import os

from conftest import SF_SMALL
from pyspark.sql import functions as F

from spark_deal_observer_spark.sources.tables import load_table
from spark_deal_observer_spark.streaming.rollup_sink import HourlyRollupSink


def _events(spark):
    return load_table(spark, SF_SMALL, "events").select("event_id", "ts", "event_type", "value")


def _full_recompute(events):
    return (
        events.groupBy("event_type", F.date_trunc("hour", "ts").alias("bucket_ts"))
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
    )


def _normalize(df):
    return sorted(
        (r["event_type"], r["bucket_ts"], r["n_events"], round(r["sum_value"], 6))
        for r in df.collect()
    )


def test_incremental_equals_full_recompute(spark, tmp_path):
    ev = _events(spark)
    sink = HourlyRollupSink(spark, str(tmp_path / "rollup"))
    # three arbitrary interleaved micro-batches covering all rows exactly once
    for i in range(3):
        sink.process_batch(ev.where(F.col("event_id") % 3 == i), batch_id=i)
    assert _normalize(sink.read_hourly()) == _normalize(_full_recompute(ev))
    # day grain derives from the maintained hourly partials
    daily = sink.read_daily()
    want_daily = (
        ev.groupBy("event_type", F.date_trunc("day", "ts").alias("bucket_ts"))
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
    )
    assert _normalize(daily) == _normalize(want_daily)


def test_tick_touches_only_its_day_partitions(spark, tmp_path):
    ev = _events(spark)
    days = sorted(r[0] for r in ev.select(F.to_date("ts")).distinct().collect())
    split = days[len(days) // 2]
    early = ev.where(F.to_date("ts") < F.lit(split))
    late = ev.where(F.to_date("ts") >= F.lit(split))
    sink = HourlyRollupSink(spark, str(tmp_path / "rollup"))
    sink.process_batch(early, batch_id=0)

    def files():
        out = {}
        for root, _, fs in os.walk(sink.path):
            part = os.path.relpath(root, sink.path)
            names = {f for f in fs if f.endswith(".parquet")}
            if names and part.startswith("day="):
                out[part] = names
        return out

    before = files()
    sink.process_batch(late, batch_id=1)
    after = files()
    untouched = [p for p in before if p < f"day={split}"]
    assert untouched, "expected early-day partitions"
    for p in untouched:
        assert after[p] == before[p], p


def test_replayed_batch_does_not_double_counters(spark, tmp_path):
    ev = _events(spark)
    sink = HourlyRollupSink(spark, str(tmp_path / "rollup"))
    sink.process_batch(ev, batch_id=7)
    once = _normalize(sink.read_hourly())
    sink.process_batch(ev, batch_id=7)  # foreachBatch replay after failure
    assert _normalize(sink.read_hourly()) == once
