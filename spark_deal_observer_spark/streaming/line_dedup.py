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
lines|; a production deployment bounds it with TTL compaction or tiers
it behind a Bloom filter — noted, not implemented, because either choice
trades recall and belongs to the deployment.

Per tick the plan is: the batch's scan-stage window expansion, an
in-batch struct-min per hash, one hash-keyed LEFT ANTI join against the
store (broadcast when the store is small, shuffle-hash at scale — the
store side carries 16-byte digests only), the per-doc reassembly
aggregate, and two appends. Nothing corpus-sized crosses to the driver.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import _line_table


def _prior_snapshot(base: str, batch_id: int) -> int | None:
    """Largest snapshot id STRICTLY below `batch_id` (replay determinism:
    a redelivered batch must see the same prior state it saw first)."""
    if not os.path.isdir(base):
        return None
    ids = [
        int(d.split("=", 1)[1])
        for d in os.listdir(base)
        if d.startswith("snapshot=") and d.split("=", 1)[1].isdigit()
    ]
    prior = [i for i in ids if i < batch_id]
    return max(prior) if prior else None


class LineDedupIngestSink:
    """foreachBatch body: rewrite each micro-batch's documents with
    already-seen lines removed; append newly-seen line hashes to the
    durable first-occurrence store."""

    def __init__(self, spark: SparkSession, out_path: str):
        self.spark = spark
        self.out_path = out_path
        self.store = f"{out_path}/store"
        self.docs = f"{out_path}/docs"

    def _seen(self, batch_id: int) -> DataFrame:
        sid = _prior_snapshot(self.store, batch_id)
        if sid is None:
            return self.spark.createDataFrame([], "lh STRING")
        return self.spark.read.parquet(f"{self.store}/snapshot={sid}")

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
        out.write.mode("overwrite").parquet(f"{self.docs}/batch_id={batch_id}")
        seen.select("lh").unionByName(new_firsts.select("lh")).write.mode(
            "overwrite"
        ).parquet(f"{self.store}/snapshot={batch_id}")

    def read_docs(self) -> DataFrame:
        return self.spark.read.option("basePath", self.docs).parquet(
            f"{self.docs}/batch_id=*"
        )
