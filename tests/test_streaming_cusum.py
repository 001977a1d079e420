"""Streaming CUSUM monitor: the streamed changepoint surface over the
maintained rollup must equal the batch operator over the same events,
and replaying a batch must change nothing (the rollup's
write-ahead-intent ledger is the monitor's idempotence)."""

from __future__ import annotations

from conftest import SF_SMALL
from pyspark.sql import functions as F

from spark_deal_observer_spark.operators.intervals import event_cusum_changepoint
from spark_deal_observer_spark.sources.tables import load_table
from spark_deal_observer_spark.streaming.cusum import CusumMonitorSink


def _rows(df):
    return {
        (r["event_type"], r["bucket_ts"]): (
            r["n_events"], r["cusum_pos"], r["cusum_neg"],
            r["alarm_pos"], r["alarm_neg"],
        )
        for r in df.collect()
    }


def test_streamed_cusum_equals_batch_operator(spark, tmp_path):
    events = load_table(spark, SF_SMALL, "events")
    sink = CusumMonitorSink(spark, str(tmp_path / "cu"))
    batches = [events.where(F.col("event_id") % 3 == i) for i in range(3)]
    for i, b in enumerate(batches):
        sink.process_batch(b, batch_id=i)
    assert _rows(sink.read_cusum()) == _rows(event_cusum_changepoint(events))


def test_replay_changes_nothing(spark, tmp_path):
    events = load_table(spark, SF_SMALL, "events")
    sink = CusumMonitorSink(spark, str(tmp_path / "cu2"))
    batches = [events.where(F.col("event_id") % 3 == i) for i in range(3)]
    for i, b in enumerate(batches):
        sink.process_batch(b, batch_id=i)
    before = _rows(sink.read_cusum())
    sink.process_batch(batches[1], batch_id=1)  # at-least-once redelivery
    assert _rows(sink.read_cusum()) == before
    # restart (fresh instance over the same state) + replay: still fixed
    sink2 = CusumMonitorSink(spark, str(tmp_path / "cu2"))
    sink2.process_batch(batches[2], batch_id=2)
    assert _rows(sink2.read_cusum()) == before


def test_empty_batch_and_pre_ingest_views(spark, tmp_path):
    events = load_table(spark, SF_SMALL, "events")
    sink = CusumMonitorSink(spark, str(tmp_path / "cu3"))
    # pre-ingest: empty TYPED frame (the forecast.read_forecast rule)
    empty = sink.read_cusum()
    assert empty.count() == 0
    assert [f.name for f in empty.schema.fields] == [
        "event_type", "bucket_ts", "n_events",
        "cusum_pos", "cusum_neg", "alarm_pos", "alarm_neg",
    ]
    sink.process_batch(events.limit(0), batch_id=0)  # empty batch: no-op
    assert sink.read_cusum().count() == 0
    sink.process_batch(events, batch_id=1)
    assert sink.read_cusum().count() > 0
