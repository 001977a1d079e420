"""Streaming CUSUM level-shift monitoring: fold each micro-batch into
the incrementally maintained hourly rollup (streaming/rollup_sink.py),
densify, and re-score with the SAME closed-form CUSUM windows as the
batch operator (operators/intervals.py::score_hourly_cusum, shared
code) — the changepoint sibling of the forecast monitor
(streaming/forecast.py), over the same state.

The score surface is |event_type| × hours (dimension-sized), so full
re-scoring per tick is two windows over a time-bounded table, and the
streamed CUSUM/alarms are definitionally equal to the batch operator's
over the same ingested events (pinned in tests/test_streaming_cusum.py).
Replay semantics ride the rollup sink's write-ahead-intent ledger: a
redelivered batch folds nothing, so the re-scored surface is unchanged —
the monitor is idempotent because its STATE is. The score directory is a
current-view artifact (latest wins) written via stage-and-swap
(streaming/atomic.py::swap_dir); construction sweeps swap debris, and
`read_cusum` returns an empty typed frame before the first non-empty
batch."""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession

from ..operators.intervals import densify_hourly, score_hourly_cusum
from .atomic import gc_swap_debris, swap_dir
from .rollup_sink import HourlyRollupSink

_SCHEMA = (
    "event_type STRING, bucket_ts TIMESTAMP_NTZ, n_events BIGINT, "
    "cusum_pos DOUBLE, cusum_neg DOUBLE, alarm_pos BOOLEAN, "
    "alarm_neg BOOLEAN"
)


class CusumMonitorSink:
    """foreachBatch body: maintain the hourly rollup, re-score CUSUM."""

    def __init__(self, spark: SparkSession, out_path: str):
        self.spark = spark
        self.rollup = HourlyRollupSink(spark, f"{out_path}/hourly")
        self.scores_path = f"{out_path}/cusum"
        gc_swap_debris(self.scores_path)

    def process_batch(self, batch: DataFrame, batch_id: int = 0) -> None:
        if batch.isEmpty():
            return
        self.rollup.process_batch(batch, batch_id)
        hourly = self.rollup.read_hourly().select(
            "event_type", "bucket_ts", "n_events"
        )
        tmp = f"{self.scores_path}__stage_{uuid.uuid4().hex[:8]}"
        score_hourly_cusum(densify_hourly(hourly)).write.mode(
            "overwrite"
        ).parquet(tmp)
        swap_dir(tmp, self.scores_path)

    def read_cusum(self) -> DataFrame:
        if not os.path.exists(os.path.join(self.scores_path, "_SUCCESS")):
            return self.spark.createDataFrame([], _SCHEMA)
        return self.spark.read.parquet(self.scores_path)
