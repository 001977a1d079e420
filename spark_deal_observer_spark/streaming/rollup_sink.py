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
    """`compensate_reverts` (default OFF, preserving SURVEY §7's flag-only
    posture and the reference's own TODO at rpc-service/service.js:57-58):
    when enabled, batch rows with `reverted = true` are RETRACTIONS — their
    partials enter the sum-merge negated, so the maintained aggregate equals
    the retained-only recompute algebraically (counts/sums are abelian-group
    elements; proof: tests/test_revert_compensation.py, streaming test:
    tests/test_rollup_sink.py). Fully-retracted buckets (net n_events ≤ 0)
    drop out, matching what a recompute over retained rows would produce.
    Replay safety is inherited unchanged from the ledger: a redelivered
    batch — retractions included — is skipped before it touches state."""

    def __init__(
        self, spark: SparkSession, path: str, compensate_reverts: bool = False
    ):
        self.spark = spark
        self.path = path
        self.compensate_reverts = compensate_reverts
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
            elif os.path.exists(live):
                # a touched day with NO staged rows was merged away
                # entirely (only possible under compensate_reverts when
                # every bucket of the day nets ≤ 0) — the retained-only
                # recompute has no partition here, so drop the live one.
                # Idempotent under recovery replay (both sides absent).
                shutil.rmtree(live)
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

    @staticmethod
    def _signed_partials(batch: DataFrame) -> DataFrame:
        """Retraction-aware partials: a `reverted = true` row contributes
        (−1, −value) — the algebraic inverse the sum-merge needs so
        merge(stored, negated) ≡ recompute(retained). Same shuffle shape
        as `_partials` (one map-side-combinable aggregate)."""
        sign = F.when(
            F.coalesce(F.col("reverted"), F.lit(False)), F.lit(-1)
        ).otherwise(F.lit(1))
        return (
            batch.groupBy(
                "event_type", trunc_ntz("hour", "ts").alias("bucket_ts")
            )
            .agg(
                F.sum(sign).alias("n_events"),
                F.sum(sign * F.col("value")).alias("sum_value"),
            )
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
        compensating = self.compensate_reverts and "reverted" in batch.columns
        mk = self._signed_partials if compensating else self._partials
        partials = mk(batch).localCheckpoint()
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
        if compensating:
            # a bucket whose every row was retracted nets to zero — the
            # retained-only recompute has no such row, so neither may we
            merged = merged.where(F.col("n_events") > 0)
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
