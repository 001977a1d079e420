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
counts double), so the sink keeps a `JsonLedger` (streaming/atomic.py) —
a high-water mark + exception set, O(1) on sequential stream ids, never
the O(ticks) id list.

CRASH-INTERRUPTION protocol (shared `JsonLedger` write-ahead intent):
EVERY tick — the first write included — stages the merged days (durable
parquet), atomically records {batch_id, staged dir, days} as `pending`,
THEN swaps, then atomically clears pending + marks seen.
Construction-time recovery completes any pending swap (each day is
either still staged — rename it in — or already swapped; both
idempotent), so every crash point resolves to exactly-once: before the
intent → clean redelivery (orphan stage swept); after the intent →
recovery finishes the swap and the ledger skips the redelivery. The
first tick goes through the same stage → intent → swap path because a
direct write has its own window: live data durable but the batch
unmarked, so the redelivery takes the merge path and double-counts
(the r5 ADVICE finding). Chaos-tested in tests/test_crash_recovery.py.
"""

from __future__ import annotations

import glob
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.epoch import trunc_ntz
from .atomic import JsonLedger

PCOL = "day"


class HourlyRollupSink:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        self.ledger = JsonLedger(
            os.path.join(path + "_meta", "seen_batches.json")
        )
        self._recover()

    def _swap_days(self, tmp: str, days: list) -> None:
        os.makedirs(self.path, exist_ok=True)
        for d in days:
            part = f"{PCOL}={d}"
            staged = os.path.join(tmp, part)
            live = os.path.join(self.path, part)
            if os.path.exists(staged):
                if os.path.exists(live):
                    shutil.rmtree(live)
                os.rename(staged, live)
        # the live table's commit marker: created (idempotently) only
        # AFTER an intent-covered swap, so exists() never observes data
        # the ledger could still double-merge
        marker = os.path.join(self.path, "_SUCCESS")
        if not os.path.exists(marker):
            open(marker, "w").close()

    def _recover(self) -> None:
        """Complete a crashed tick: if the ledger carries a pending
        intent, its staged days are either still in the stage dir (swap
        them in) or already live (nothing to do) — both idempotent — then
        the batch is marked seen, so its redelivery is skipped instead of
        double-merged. Orphan stage dirs with NO intent are pre-merge
        garbage and are swept."""
        pending = self.ledger.pending()
        if pending:
            if os.path.isdir(pending["tmp"]):
                self._swap_days(pending["tmp"], pending["days"])
                shutil.rmtree(pending["tmp"], ignore_errors=True)
            self.ledger.mark_seen(pending["batch_id"])
        for d in glob.glob(f"{self.path}__stage_*"):
            shutil.rmtree(d, ignore_errors=True)

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
        if self.ledger.seen(batch_id):
            return  # replayed batch: counters must not double
        partials = self._partials(batch).localCheckpoint()
        days = [r[0] for r in partials.select(PCOL).distinct().collect()]
        if self.exists():
            stored = self.spark.read.parquet(self.path).where(
                F.col(PCOL).isin(days)
            )
            merged = (
                stored.unionByName(partials)
                .groupBy("event_type", "bucket_ts", PCOL)
                .agg(
                    F.sum("n_events").alias("n_events"),
                    F.sum("sum_value").alias("sum_value"),
                )
                .select("event_type", "bucket_ts", "n_events", "sum_value", PCOL)
            )
        else:
            merged = partials.select(
                "event_type", "bucket_ts", "n_events", "sum_value", PCOL
            )
        tmp = f"{self.path}__stage_{uuid.uuid4().hex[:8]}"
        merged.write.mode("overwrite").partitionBy(PCOL).parquet(tmp)
        # write-ahead intent: after this atomic ledger write the batch is
        # COMMITTED — any crash during/after the swap is completed by
        # construction-time recovery, and the redelivery is skipped
        self.ledger.set_pending(
            {"batch_id": batch_id, "tmp": tmp, "days": [str(d) for d in days]}
        )
        self._swap_days(tmp, [str(d) for d in days])
        shutil.rmtree(tmp, ignore_errors=True)
        self.ledger.mark_seen(batch_id)
