"""Streaming load-forecast monitoring: fold each micro-batch into the
incrementally maintained hourly rollup (streaming/rollup_sink.py), then
re-smooth the maintained bucket table with the SAME truncated-EWMA
window as the batch operator (operators/intervals.py::score_hourly_ewma,
shared code) — the forecasting sibling of the anomaly monitor
(streaming/anomaly.py), over the same state.

The score surface is |event_type| × hours (dimension-sized), so full
re-smoothing per tick is one window over a time-bounded table, and the
streamed forecasts are definitionally equal to the batch operator's over
the same ingested events (pinned in tests/test_streaming_forecast.py).
Replay semantics ride the rollup sink's write-ahead-intent ledger: a
redelivered batch folds nothing, so the re-smoothed surface is unchanged
— the monitor is idempotent because its STATE is. Latest-wins overwrite
for the score directory: a forecast surface is a current-view artifact,
not an event log."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.intervals import score_hourly_ewma
from .rollup_sink import HourlyRollupSink


class ForecastMonitorSink:
    """foreachBatch body: maintain the hourly rollup, re-smooth it."""

    def __init__(self, spark: SparkSession, out_path: str):
        self.spark = spark
        self.rollup = HourlyRollupSink(spark, f"{out_path}/hourly")
        self.scores_path = f"{out_path}/forecast"

    def process_batch(self, batch: DataFrame, batch_id: int = 0) -> None:
        if batch.isEmpty():
            return
        self.rollup.process_batch(batch, batch_id)
        hourly = self.rollup.read_hourly().select(
            "event_type", "bucket_ts", "n_events"
        )
        score_hourly_ewma(hourly).write.mode("overwrite").parquet(
            self.scores_path
        )

    def read_forecast(self) -> DataFrame:
        return self.spark.read.parquet(self.scores_path)
