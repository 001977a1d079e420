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


def test_compensate_reverts_equals_retained_recompute(spark, tmp_path):
    """Opt-in revert compensation (VERDICT r8 #5): ingest ticks, then a
    retraction tick arrives (reverted=true rows for previously-ingested
    events) — the compensated rollup must equal a retained-only recompute
    bit-for-bit on counts (6-dp on float sums), replays must stay no-ops
    under the existing ledger, and the default-off sink is untouched."""
    ev = _events(spark)
    sink = HourlyRollupSink(
        spark, str(tmp_path / "rollup"), compensate_reverts=True
    )
    for i in range(2):
        sink.process_batch(
            ev.where(F.col("event_id") % 2 == i).withColumn(
                "reverted", F.lit(False)
            ),
            batch_id=i,
        )
    # the revert tick: every 'error' event is retracted (the engine's
    # reverted derivation, plans/deals.py) — same rows, negated partials
    revert = ev.where("event_type = 'error'").withColumn(
        "reverted", F.lit(True)
    )
    assert revert.count() > 0
    sink.process_batch(revert, batch_id=2)
    retained = _full_recompute(ev.where("event_type <> 'error'"))
    assert _normalize(sink.read_hourly()) == _normalize(retained)

    # replaying the revert tick must not compensate twice
    sink.process_batch(revert, batch_id=2)
    assert _normalize(sink.read_hourly()) == _normalize(retained)

    # restart resumes from the ledger: replay still skipped
    sink2 = HourlyRollupSink(
        spark, str(tmp_path / "rollup"), compensate_reverts=True
    )
    sink2.process_batch(revert, batch_id=2)
    assert _normalize(sink2.read_hourly()) == _normalize(retained)


def test_compensation_default_off_ignores_flag_column(spark, tmp_path):
    """Default (flag-only) behavior unchanged even when batches carry a
    `reverted` column: rows count positively regardless of the flag."""
    ev = _events(spark)
    sink = HourlyRollupSink(spark, str(tmp_path / "rollup"))
    sink.process_batch(
        ev.withColumn("reverted", F.col("event_type") == "error"), batch_id=0
    )
    assert _normalize(sink.read_hourly()) == _normalize(_full_recompute(ev))
