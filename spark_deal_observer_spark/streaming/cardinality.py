"""Streaming distinct-user cardinality monitoring via mergeable HLL
registers — the online companion of `operators/sketches.py::
hll_distinct_audit`, and the third consumer of the train-once/artifact
pattern's underlying idea (streaming/scoring.py, streaming/drift.py are
the others): per-group state is the FIXED-SIZE register table
(≤ |groups|·1024 rows), never a value set, so the sink's state footprint
is independent of how many users the stream has ever seen.

The property that carries the whole design is that max-per-(key, bucket)
IS the HLL merge and max is IDEMPOTENT: re-merging a replayed micro-batch
leaves the registers bit-identical, so at-least-once delivery yields
exactly the once-only registers with no dedup bookkeeping — effectively-
once semantics for free, from sketch algebra instead of a transaction log
(the merge-idempotence twin of streaming/sink.py's key-dedup approach;
pinned in tests/test_streaming_cardinality.py).

Per tick the plan is: batch registers (one map-side-combined max
aggregate over the batch), a (key, bucket) max-merge against the
persisted register snapshot, one register-table write, and one estimate
row per group appended to the report. Register snapshots are written per
batch_id (the idempotent replay unit, same layout as DriftMonitorSink's
report) and the merge reads the snapshot with the largest id STRICTLY
BELOW the tick's batch_id (the line-dedup replay rule) — reading "latest"
would make a same-batch-id redelivery read snapshot=N while overwriting
snapshot=N, which Spark rejects ('Cannot overwrite a path that is also
being read from') and which would wedge the restarted stream in a crash
loop. Strictly-below reads make redelivery bit-identical by construction;
a production deployment would point this at a transactional table — the
snapshot-per-tick layout keeps the semantics identical and the tests
hermetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.sketches import hll_estimate, hll_registers
from .atomic import SnapshotStore


class CardinalityMonitorSink:
    """foreachBatch body: merge each micro-batch's HLL registers into the
    persisted register state and append per-group distinct estimates."""

    def __init__(
        self,
        spark: SparkSession,
        out_path: str,
        key: str = "event_type",
        keep_snapshots: int | None = None,
    ):
        self.spark = spark
        self.out_path = out_path
        self.key = key
        # snapshot-horizon GC: register snapshots beyond the newest
        # `keep_snapshots` are replay-dead (Structured Streaming redelivers
        # at most the tail of the batch log) — None keeps history for
        # audit, an int bounds disk at O(keep × state) instead of O(ticks)
        self.keep = keep_snapshots
        # shared snapshot protocol (streaming/atomic.py): committed-only
        # restart recovery + strictly-below replay reads
        self._regs = SnapshotStore(spark, f"{out_path}/registers")
        self._reports = SnapshotStore(spark, f"{out_path}/report", "batch_id")
        self._last_snapshot: int | None = self._regs.latest_id()

    def _registers(self, before: int | None = None) -> DataFrame | None:
        """Register snapshot: the latest (reads/tests), or — given a
        batch_id — the one STRICTLY below it (the replay-safe merge
        input; see module docstring)."""
        if before is None:
            sid = self._last_snapshot
            return None if sid is None else self._regs.read(sid)
        return self._regs.read_prior(before)

    def process_batch(self, batch: DataFrame, batch_id: int = 0) -> None:
        prev = self._registers(before=batch_id)
        if batch.isEmpty() and prev is None:
            return
        regs = hll_registers(batch, self.key) if not batch.isEmpty() else None
        if prev is not None and regs is not None:
            from pyspark.sql import functions as F

            regs = (
                prev.unionByName(regs)
                .groupBy(self.key, "bucket")
                .agg(F.max("rho").alias("rho"))
            )
        elif regs is None:
            regs = prev
        self._regs.write(regs, batch_id)
        if self.keep:
            self._regs.gc(self.keep)
        self._last_snapshot = batch_id
        merged = self._regs.read(batch_id)
        report = hll_estimate(merged, [self.key]).selectExpr(
            self.key, "ROUND(est, 4) AS distinct_est"
        )
        self._reports.write(report, batch_id)

    def read_report(self) -> DataFrame:
        return self._reports.read_all()
