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
directory is overwritten per tick (latest-wins): anomaly surfaces are a
current-view artifact, not an event log; alert history belongs to the
alert consumer."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.intervals import score_hourly_anomalies
from .rollup_sink import HourlyRollupSink


class AnomalyMonitorSink:
    """foreachBatch body: maintain the hourly rollup, re-score it."""

    def __init__(self, spark: SparkSession, out_path: str):
        self.spark = spark
        self.rollup = HourlyRollupSink(spark, f"{out_path}/hourly")
        self.scores_path = f"{out_path}/scores"

    def process_batch(self, batch: DataFrame, batch_id: int = 0) -> None:
        if batch.isEmpty():
            return
        self.rollup.process_batch(batch, batch_id)
        hourly = self.rollup.read_hourly().select(
            "event_type", "bucket_ts", "n_events"
        )
        score_hourly_anomalies(hourly).write.mode("overwrite").parquet(
            self.scores_path
        )

    def read_scores(self) -> DataFrame:
        return self.spark.read.parquet(self.scores_path)
