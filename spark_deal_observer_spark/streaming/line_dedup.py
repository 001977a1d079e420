"""Streaming line-level dedup at ingest: the incremental twin of
`operators/dedup.py::dedup_lines` (CCNet/RefinedWeb boilerplate removal).
Each micro-batch's documents are rewritten with every line dropped that
was already seen — in an EARLIER batch (via the durable first-occurrence
store) or earlier in THIS batch (in-batch struct-min, the same global
argmin the batch operator uses) — so the concatenation of all batch
outputs equals the batch operator run over the concatenated corpus when
batches arrive in doc_id order (pinned in tests).

State is the line-hash store: one (lh) row per distinct line ever seen,
snapshotted per batch_id like the cardinality monitor's registers. A
tick reads the snapshot with the LARGEST id STRICTLY BELOW its batch_id
— never "latest" — so replaying a delivered batch reads the same prior
state and rewrites bit-identical outputs and snapshot (effectively-once
under at-least-once delivery, no ledger). Store growth is |distinct
lines| — inherent to EXACT global line dedup. `BoundedLineDedupIngestSink`
is the bounded-state tier: every store row carries a `last_seen` batch id
maintained by MAX-merge (idempotent, so the replay rule still yields
bit-identical snapshots), rows idle for more than `ttl_batches` ticks are
compacted away at snapshot write, and snapshot directories older than the
replay horizon are garbage-collected — state is O(distinct lines in the
last ttl_batches ticks) rows and O(keep_snapshots) directories instead of
O(all distinct lines ever) and O(ticks). The recall trade is explicit and
deterministic: a line recurring after more than ttl_batches ticks of
absence is treated as first-seen again (the duplicate is kept) — a
sliding-window dedup, the same contract TTL'd dedup state has in any
production stream processor. A Bloom front tier was considered and
rejected: false positives DROP never-seen lines (precision loss —
corrupts documents), while TTL only weakens recall (keeps some
duplicates), the safe direction for corpus prep. The trade is measured in
tests/test_line_dedup_bounded.py: in-window duplicates dedup identically
to the exact sink; only cross-window recurrences differ.

Per tick the plan is: the batch's scan-stage window expansion, an
in-batch struct-min per hash, one hash-keyed LEFT ANTI join against the
store (broadcast when the store is small, shuffle-hash at scale — the
store side carries 16-byte digests only), the per-doc reassembly
aggregate, and two appends. Nothing corpus-sized crosses to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import _line_table
from .atomic import SnapshotStore


class LineDedupIngestSink:
    """foreachBatch body: rewrite each micro-batch's documents with
    already-seen lines removed; append newly-seen line hashes to the
    durable first-occurrence store."""

    def __init__(
        self, spark: SparkSession, out_path: str, keep_snapshots: int | None = None
    ):
        self.spark = spark
        self.out_path = out_path
        self.store = f"{out_path}/store"
        self.docs = f"{out_path}/docs"
        # snapshot-horizon GC (every snapshot carries the FULL line store,
        # so dirs beyond the replay horizon are pure duplication): None =
        # keep history, int = O(keep × store) disk instead of O(ticks ×
        # store). The bounded subclass supplies its own keep semantics.
        self.keep = keep_snapshots
        # the shared snapshot protocol (committed-only selection,
        # strictly-below replay reads, GC) — see streaming/atomic.py
        self._store = SnapshotStore(spark, self.store)
        self._docs = SnapshotStore(spark, self.docs, "batch_id")

    def _seen(self, batch_id: int) -> DataFrame:
        return self._store.read_prior(batch_id, "lh STRING")

    def process_batch(self, batch: DataFrame, batch_id: int = 0) -> None:
        if batch.isEmpty():
            return
        occ = _line_table(batch).select(
            "doc_id", "pos", "line", F.md5("line").alias("lh")
        )
        firsts = (
            occ.groupBy("lh")
            .agg(F.min(F.struct("doc_id", "pos")).alias("first"))
            .select(
                "lh",
                F.col("first.doc_id").alias("f_doc"),
                F.col("first.pos").alias("f_pos"),
            )
        )
        seen = self._seen(batch_id)
        new_firsts = firsts.join(seen, "lh", "left_anti").localCheckpoint(
            eager=True
        )
        kept = occ.join(new_firsts, "lh").where(
            (F.col("doc_id") == F.col("f_doc")) & (F.col("pos") == F.col("f_pos"))
        )
        totals = occ.groupBy("doc_id").agg(
            F.count("*").cast("bigint").alias("n_lines")
        )
        cleaned = (
            kept.groupBy("doc_id")
            .agg(
                F.count("*").cast("bigint").alias("n_kept"),
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("pos", "line"))),
                        lambda s: s["line"],
                    ),
                    " ",
                ).alias("clean_text"),
            )
        )
        out = totals.join(cleaned, "doc_id", "left").select(
            "doc_id",
            "n_lines",
            F.coalesce("n_kept", F.lit(0)).cast("bigint").alias("n_kept"),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        )
        # overwrite-per-batch_id directories: replays land bit-identical
        self._docs.write(out, batch_id)
        self._write_store(seen, new_firsts, occ, batch_id)

    def _write_store(
        self, seen: DataFrame, new_firsts: DataFrame, occ: DataFrame, batch_id: int
    ) -> None:
        self._store.write(
            seen.select("lh").unionByName(new_firsts.select("lh")), batch_id
        )
        if self.keep:
            self._store.gc(self.keep)

    def read_docs(self) -> DataFrame:
        return self._docs.read_all()


class BoundedLineDedupIngestSink(LineDedupIngestSink):
    """The bounded-state tier: TTL compaction + snapshot GC.

    Store rows carry `last_seen` (the latest batch id the line occurred
    in, kept OR dropped), maintained by MAX-merge — idempotent, so the
    strictly-below replay rule still rewrites bit-identical snapshots. A
    line is in-window for batch B iff `B - last_seen <= ttl_batches`;
    out-of-window rows are invisible to the anti-join (read filter) and
    compacted out of the written snapshot (write filter), so the store is
    O(distinct lines occurring in the last ttl_batches ticks). Snapshot
    directories older than the newest `keep_snapshots` are deleted after
    each successful write — Structured Streaming redelivers at most the
    tail of the batch log, so the replay horizon needs only a couple of
    prior snapshots, and total on-disk state stops scaling with stream
    lifetime.

    Recall contract (measured in tests/test_line_dedup_bounded.py):
    duplicates recurring WITHIN the window dedup exactly like the exact
    sink; a line absent for more than ttl_batches ticks is first-seen
    again and kept. False drops are impossible by construction (every
    store row was a real line), which is why TTL beats a Bloom front for
    corpus prep: Bloom false positives would silently delete never-seen
    lines."""

    def __init__(
        self,
        spark: SparkSession,
        out_path: str,
        ttl_batches: int = 8,
        keep_snapshots: int = 3,
    ):
        super().__init__(spark, out_path)
        self.ttl = int(ttl_batches)
        self.keep = max(2, int(keep_snapshots))  # replay needs a prior

    def _store_snapshot(self, batch_id: int) -> DataFrame:
        return self._store.read_prior(batch_id, "lh STRING, last_seen BIGINT")

    def _seen(self, batch_id: int) -> DataFrame:
        return (
            self._store_snapshot(batch_id)
            .where(F.col("last_seen") >= batch_id - self.ttl)
            .select("lh")
        )

    def _write_store(
        self, seen: DataFrame, new_firsts: DataFrame, occ: DataFrame, batch_id: int
    ) -> None:
        batch_lines = (
            occ.select("lh")
            .distinct()
            .withColumn("last_seen", F.lit(batch_id).cast("bigint"))
        )
        merged = (
            self._store_snapshot(batch_id)
            .unionByName(batch_lines)
            .groupBy("lh")
            .agg(F.max("last_seen").alias("last_seen"))
            # write-side compaction: keep only rows a FUTURE batch could
            # still see in-window (the next tick is at least batch_id+1)
            .where(F.col("last_seen") >= batch_id + 1 - self.ttl)
        )
        self._store.write(merged, batch_id)
        # delete snapshots beyond the replay horizon AFTER the new one is
        # durable: a crash between write and GC only leaves extras
        self._store.gc(self.keep)
