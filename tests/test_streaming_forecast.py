"""Streaming forecast monitor: the streamed EWMA/forecast surface over
the maintained rollup must equal the batch operator over the same
events, and replaying a batch must change nothing (the rollup's
write-ahead-intent ledger is the monitor's idempotence)."""

from __future__ import annotations

from conftest import SF_SMALL
from pyspark.sql import functions as F

from spark_deal_observer_spark.operators.intervals import event_ewma_forecast
from spark_deal_observer_spark.sources.tables import load_table
from spark_deal_observer_spark.streaming.forecast import ForecastMonitorSink


def _rows(df):
    return {
        (r["event_type"], r["bucket_ts"]): (
            r["n_events"], r["ewma"], r["forecast"], r["forecast_err"]
        )
        for r in df.collect()
    }


def test_streamed_forecast_equals_batch_operator(spark, tmp_path):
    events = load_table(spark, SF_SMALL, "events")
    sink = ForecastMonitorSink(spark, str(tmp_path / "fc"))
    batches = [events.where(F.col("event_id") % 3 == i) for i in range(3)]
    for i, b in enumerate(batches):
        sink.process_batch(b, batch_id=i)
    assert _rows(sink.read_forecast()) == _rows(event_ewma_forecast(events))


def test_replay_changes_nothing(spark, tmp_path):
    events = load_table(spark, SF_SMALL, "events")
    sink = ForecastMonitorSink(spark, str(tmp_path / "fc2"))
    batches = [events.where(F.col("event_id") % 3 == i) for i in range(3)]
    for i, b in enumerate(batches):
        sink.process_batch(b, batch_id=i)
    before = _rows(sink.read_forecast())
    sink.process_batch(batches[1], batch_id=1)  # at-least-once redelivery
    assert _rows(sink.read_forecast()) == before
    # restart (fresh instance over the same state) + replay: still fixed
    sink2 = ForecastMonitorSink(spark, str(tmp_path / "fc2"))
    sink2.process_batch(batches[2], batch_id=2)
    assert _rows(sink2.read_forecast()) == before
