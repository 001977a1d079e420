"""Streaming anomaly monitoring: fold each micro-batch into the
incrementally maintained hourly rollup (streaming/rollup_sink.py — the
sink that never rescans history), then re-score the maintained bucket
table with the SAME rolling z-score window as the batch operator
(operators/intervals.py::score_hourly_anomalies, shared code). Because
scoring runs over the bucket table — |event_type| × hours, time-bounded
— recomputing the full score surface per tick costs one window over a
dimension-sized table, and the streamed scores are definitionally equal
to the batch operator's over the same ingested events (pinned in
tests/test_streaming_anomaly.py).

Replay semantics ride the rollup sink's batch-id guard: a redelivered
batch folds nothing (counters must not double), so the re-scored surface
is unchanged — the monitor is idempotent because its STATE is. The score
directory is a current-view artifact (latest wins, alert history belongs
to the alert consumer), but the overwrite is staged and swapped
(streaming/atomic.py::swap_dir) so a crash mid-write never leaves a torn
surface; before the first non-empty batch `read_scores` returns an empty
typed frame."""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession

from ..operators.intervals import score_hourly_anomalies
from .atomic import gc_swap_debris, swap_dir
from .rollup_sink import HourlyRollupSink

_SCHEMA = (
    "event_type STRING, bucket_ts TIMESTAMP_NTZ, n_events BIGINT, "
    "base_mean DOUBLE, base_std DOUBLE, z DOUBLE, is_anomaly BOOLEAN"
)


class AnomalyMonitorSink:
    """foreachBatch body: maintain the hourly rollup, re-score it."""

    def __init__(self, spark: SparkSession, out_path: str):
        self.spark = spark
        self.rollup = HourlyRollupSink(spark, f"{out_path}/hourly")
        self.scores_path = f"{out_path}/scores"
        gc_swap_debris(self.scores_path)

    def process_batch(self, batch: DataFrame, batch_id: int = 0) -> None:
        if batch.isEmpty():
            return
        self.rollup.process_batch(batch, batch_id)
        hourly = self.rollup.read_hourly().select(
            "event_type", "bucket_ts", "n_events"
        )
        tmp = f"{self.scores_path}__stage_{uuid.uuid4().hex[:8]}"
        score_hourly_anomalies(hourly).write.mode("overwrite").parquet(tmp)
        swap_dir(tmp, self.scores_path)

    def read_scores(self) -> DataFrame:
        if not os.path.exists(os.path.join(self.scores_path, "_SUCCESS")):
            return self.spark.createDataFrame([], _SCHEMA)
        return self.spark.read.parquet(self.scores_path)
