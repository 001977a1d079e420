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
— the monitor is idempotent because its STATE is. The score directory is
a current-view artifact (latest wins), but the overwrite is staged and
swapped (streaming/atomic.py::swap_dir): a plain in-place overwrite
deletes the old surface before the new one commits, so a crash mid-write
leaves a torn directory for `read_forecast`. Construction sweeps swap
debris and restores an interrupted swap's backup; before the first
non-empty batch `read_forecast` returns an empty typed frame."""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession

from ..operators.intervals import score_hourly_ewma
from .atomic import gc_swap_debris, swap_dir
from .rollup_sink import HourlyRollupSink

_SCHEMA = (
    "event_type STRING, bucket_ts TIMESTAMP_NTZ, n_events BIGINT, "
    "ewma DOUBLE, forecast DOUBLE, forecast_err DOUBLE"
)


class ForecastMonitorSink:
    """foreachBatch body: maintain the hourly rollup, re-smooth it."""

    def __init__(self, spark: SparkSession, out_path: str):
        self.spark = spark
        self.rollup = HourlyRollupSink(spark, f"{out_path}/hourly")
        self.scores_path = f"{out_path}/forecast"
        gc_swap_debris(self.scores_path)

    def process_batch(self, batch: DataFrame, batch_id: int = 0) -> None:
        if batch.isEmpty():
            return
        self.rollup.process_batch(batch, batch_id)
        hourly = self.rollup.read_hourly().select(
            "event_type", "bucket_ts", "n_events"
        )
        tmp = f"{self.scores_path}__stage_{uuid.uuid4().hex[:8]}"
        score_hourly_ewma(hourly).write.mode("overwrite").parquet(tmp)
        swap_dir(tmp, self.scores_path)

    def read_forecast(self) -> DataFrame:
        if not os.path.exists(os.path.join(self.scores_path, "_SUCCESS")):
            return self.spark.createDataFrame([], _SCHEMA)
        return self.spark.read.parquet(self.scores_path)
