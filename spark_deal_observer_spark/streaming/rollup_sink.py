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

CRASH-INTERRUPTION protocol (the r5 hardening): a ledger mark AFTER the
partition swaps leaves a window — crash between swap and mark and the
redelivered batch re-merges already-merged counters (double counting);
a mark BEFORE the swap loses the batch instead. The fix is a
write-ahead INTENT: stage the merged days (durable parquet), atomically
record {batch_id, staged dir, days} as `pending` in the ledger, THEN
swap, then atomically clear pending + mark seen. Construction-time
recovery completes any pending swap (each day is either still staged —
rename it in — or already swapped; both idempotent), so every crash
point resolves to exactly-once: before the intent → clean redelivery
(orphan stage swept); after the intent → recovery finishes the swap and
the ledger skips the redelivery. Chaos-tested in
tests/test_crash_recovery.py.
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
        self._recover()

    # -- batch-id guard (counter idempotence under foreachBatch replay) ----

    def _ledger(self) -> dict:
        """{"seen": [...], "pending": {"batch_id", "tmp", "days"} | None};
        reads the legacy bare-list format transparently."""
        if os.path.exists(self._seen_path):
            data = json.load(open(self._seen_path))
            if isinstance(data, list):
                return {"seen": data, "pending": None}
            return data
        return {"seen": [], "pending": None}

    def _write_ledger(self, ledger: dict) -> None:
        os.makedirs(os.path.dirname(self._seen_path), exist_ok=True)
        tmp = self._seen_path + ".tmp"
        json.dump(ledger, open(tmp, "w"))
        os.replace(tmp, self._seen_path)  # atomic on POSIX

    def _seen(self) -> set[int]:
        return set(self._ledger()["seen"])

    def _swap_days(self, tmp: str, days: list) -> None:
        for d in days:
            part = f"{PCOL}={d}"
            staged = os.path.join(tmp, part)
            live = os.path.join(self.path, part)
            if os.path.exists(staged):
                if os.path.exists(live):
                    shutil.rmtree(live)
                os.rename(staged, live)

    def _recover(self) -> None:
        """Complete a crashed tick: if the ledger carries a pending
        intent, its staged days are either still in the stage dir (swap
        them in) or already live (nothing to do) — both idempotent — then
        the batch is marked seen, so its redelivery is skipped instead of
        double-merged. Orphan stage dirs with NO intent are pre-merge
        garbage and are swept."""
        ledger = self._ledger()
        pending = ledger.get("pending")
        if pending:
            if os.path.isdir(pending["tmp"]):
                self._swap_days(pending["tmp"], pending["days"])
                shutil.rmtree(pending["tmp"], ignore_errors=True)
            ledger["seen"] = sorted(set(ledger["seen"]) | {pending["batch_id"]})
            ledger["pending"] = None
            self._write_ledger(ledger)
        import glob

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

    def _mark_seen(self, batch_id: int) -> None:
        ledger = self._ledger()
        ledger["seen"] = sorted(set(ledger["seen"]) | {batch_id})
        ledger["pending"] = None
        self._write_ledger(ledger)

    def process_batch(self, batch: DataFrame, batch_id: int = 0) -> None:
        if batch_id in self._seen():
            return  # replayed batch: counters must not double
        partials = self._partials(batch).localCheckpoint()
        if not self.exists():
            partials.write.mode("overwrite").partitionBy(PCOL).parquet(self.path)
            self._mark_seen(batch_id)
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
        # write-ahead intent: after this atomic ledger write the batch is
        # COMMITTED — any crash during/after the swap is completed by
        # construction-time recovery, and the redelivery is skipped
        ledger = self._ledger()
        ledger["pending"] = {
            "batch_id": batch_id,
            "tmp": tmp,
            "days": [str(d) for d in days],
        }
        self._write_ledger(ledger)
        self._swap_days(tmp, [str(d) for d in days])
        shutil.rmtree(tmp, ignore_errors=True)
        self._mark_seen(batch_id)
