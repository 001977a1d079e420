"""Incrementally-maintained continuous aggregate: the streaming
materialized-view form of operators/intervals.py::hypertable_rollup.

The batch rollup recomputes hour/day grains from the corpus; a live
pipeline can't rescan history per tick. This sink maintains the HOURLY
aggregate table incrementally: each micro-batch folds its partial counts
into only the (day-partitioned) slices it touches — count/sum are
mergeable, so batch partials + stored partials recombine losslessly, and
the day grain stays derivable from the maintained hourly table at read
time (24× smaller than raw).

Write discipline mirrors PartitionedDealTableSink: compute the batch's day
set (micro-batches are time-contiguous — a handful of days), read ONLY
those partitions, merge, stage, swap. O(batch-days), never O(history),
per tick; replaying a batch is NOT idempotent for counters (append-only
counts double), so the sink records processed batch ids — the same
last-batch-id guard foreachBatch users need anywhere counters are
involved.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.epoch import trunc_ntz

PCOL = "day"


class HourlyRollupSink:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        self._seen_path = os.path.join(path + "_meta", "seen_batches.json")

    # -- batch-id guard (counter idempotence under foreachBatch replay) ----

    def _seen(self) -> set[int]:
        if os.path.exists(self._seen_path):
            return set(json.load(open(self._seen_path)))
        return set()

    def _mark(self, batch_id: int) -> None:
        os.makedirs(os.path.dirname(self._seen_path), exist_ok=True)
        seen = self._seen() | {batch_id}
        tmp = self._seen_path + ".tmp"
        json.dump(sorted(seen), open(tmp, "w"))
        os.replace(tmp, self._seen_path)

    # -- aggregate maintenance ---------------------------------------------

    @staticmethod
    def _partials(batch: DataFrame) -> DataFrame:
        return (
            batch.groupBy(
                "event_type", trunc_ntz("hour", "ts").alias("bucket_ts")
            )
            .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
            .withColumn(PCOL, F.to_date("bucket_ts"))
        )

    def exists(self) -> bool:
        return os.path.exists(os.path.join(self.path, "_SUCCESS"))

    def read_hourly(self) -> DataFrame:
        return self.spark.read.parquet(self.path).drop(PCOL)

    def read_daily(self) -> DataFrame:
        """The coarse grain, derived from the maintained hourly partials."""
        return (
            self.spark.read.parquet(self.path)
            .groupBy("event_type", trunc_ntz("day", "bucket_ts").alias("bucket_ts"))
            .agg(F.sum("n_events").alias("n_events"), F.sum("sum_value").alias("sum_value"))
        )

    def process_batch(self, batch: DataFrame, batch_id: int = 0) -> None:
        if batch_id in self._seen():
            return  # replayed batch: counters must not double
        partials = self._partials(batch).localCheckpoint()
        if not self.exists():
            partials.write.mode("overwrite").partitionBy(PCOL).parquet(self.path)
            self._mark(batch_id)
            return
        days = [r[0] for r in partials.select(PCOL).distinct().collect()]
        stored = self.spark.read.parquet(self.path).where(F.col(PCOL).isin(days))
        merged = (
            stored.unionByName(partials)
            .groupBy("event_type", "bucket_ts", PCOL)
            .agg(F.sum("n_events").alias("n_events"), F.sum("sum_value").alias("sum_value"))
            .select("event_type", "bucket_ts", "n_events", "sum_value", PCOL)
        )
        tmp = f"{self.path}__stage_{uuid.uuid4().hex[:8]}"
        merged.write.mode("overwrite").partitionBy(PCOL).parquet(tmp)
        try:
            for d in days:
                part = f"{PCOL}={d}"
                staged = os.path.join(tmp, part)
                live = os.path.join(self.path, part)
                if os.path.exists(staged):
                    if os.path.exists(live):
                        shutil.rmtree(live)
                    os.rename(staged, live)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
        self._mark(batch_id)
