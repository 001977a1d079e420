"""Streaming token-frequency monitoring via mergeable count–min sketches —
the frequency companion of streaming/cardinality.py, and the honest
contrast in sketch-merge semantics: the CMS merge (sum-per-cell) is
associative and commutative but NOT idempotent, so unlike the HLL's
max-merge it cannot absorb at-least-once replay for free. A replayed
micro-batch would double-count every cell. The sink therefore pairs the
merge with a PROCESSED-BATCH LEDGER (the same effectively-once discipline
as streaming/sink.py's key-dedup): a batch id already in the ledger is
skipped before any state is touched.

State is fixed-size either way: ≤ depth×width counter rows per snapshot
regardless of how many tokens the stream has ever carried. Per tick the
plan is one vocabulary-first batch sketch (map-side combined), a
(d, cell) sum-merge against the persisted snapshot, and a broadcast probe
join appending one estimate row per probe token to the report.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.sketches import cms_cells, cms_probe_estimates
from .atomic import SnapshotStore


class FrequencyMonitorSink:
    """foreachBatch body: ledger-guarded CMS sum-merge + probe report."""

    def __init__(
        self, spark: SparkSession, out_path: str, keep_snapshots: int | None = None
    ):
        self.spark = spark
        self.out_path = out_path
        self.keep = keep_snapshots  # None = audit history; int = bounded disk
        self._sketches = SnapshotStore(spark, f"{out_path}/sketch")
        self._reports = SnapshotStore(spark, f"{out_path}/report", "batch_id")
        # restart recovery: resume from the last durable snapshot, and
        # treat every batch id at or below it as already applied —
        # Structured Streaming replays foreachBatch ids in order, so the
        # snapshot id doubles as the ledger's durable high-water mark.
        # The mark stays an INT (a long-running stream's ids reach
        # millions; materializing set(range(id)) would be O(batch_id)
        # memory for what is a single comparison); the set only records
        # post-restart ids that advanced no snapshot (empty-batch ticks).
        self._last_snapshot: int | None = self._sketches.latest_id()
        self._applied: set[int] = set()

    def _is_applied(self, batch_id: int) -> bool:
        if self._last_snapshot is not None and batch_id <= self._last_snapshot:
            return True
        return batch_id in self._applied

    def _sketch(self) -> DataFrame | None:
        if self._last_snapshot is None:
            return None
        return self._sketches.read(self._last_snapshot)

    def process_batch(self, batch: DataFrame, batch_id: int = 0) -> None:
        if self._is_applied(batch_id):
            # sum-merge is not idempotent: a replayed batch must be
            # dropped BEFORE it reaches the state, not re-merged
            return
        prev = self._sketch()
        if batch.isEmpty() and prev is None:
            self._applied.add(batch_id)
            return
        cells = cms_cells(batch) if not batch.isEmpty() else None
        if prev is not None and cells is not None:
            cells = (
                prev.unionByName(cells)
                .groupBy("d", "cell")
                .agg(F.sum("cnt").alias("cnt"))
            )
        elif cells is None:
            cells = prev
        self._sketches.write(cells, batch_id)
        if self.keep:
            self._sketches.gc(self.keep)
        self._last_snapshot = batch_id
        # ids at/below the advanced mark are covered by _is_applied; the
        # in-memory set can forget them (bounds the ledger's footprint)
        self._applied = {i for i in self._applied if i > batch_id}
        report = cms_probe_estimates(self._sketches.read(batch_id), self.spark)
        self._reports.write(report, batch_id)

    def read_report(self) -> DataFrame:
        return self._reports.read_all()
