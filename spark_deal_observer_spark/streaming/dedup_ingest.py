"""Streaming near-duplicate suppression at ingest: MinHash-LSH dedup
applied per micro-batch against the accumulated signature store.

The batch dedup family (operators/dedup.py) answers "which documents in
this corpus are near-duplicates"; an LLM ingestion pipeline needs the
ONLINE form — "is this incoming document a near-duplicate of anything we
already accepted" — before the document ever lands in the corpus. The
reference's ingest sink has the exact-key version of this contract
(ON CONFLICT DO NOTHING, deal-observer.js:67-88 / streaming/sink.py T6);
this module is the similarity generalization.

Per micro-batch (inside foreachBatch — the batch DataFrame API is
available there, so the whole dedup family composes):

  1. signatures  — MinHash band keys for the batch docs: a narrow
                   scan-stage pass (hash each shingle once; see
                   functions/hashing.py).
  2. probe       — semi-join the batch's (band, key) pairs against the
                   signature STORE, partitioned by band: a batch-sized
                   broadcast probe against a band-pruned store read — the
                   store side never shuffles.
  3. admit       — batch docs with NO colliding band (a new document) are
                   appended to the corpus table; their band keys are
                   appended to the store, so later batches dedup against
                   them. In-batch near-dups collapse to the min doc_id
                   through the same band keys.

Replay idempotence comes for free: a replayed document collides with its
own stored bands and is dropped — the same at-least-once × keyed-dedup =
effectively-once argument as the exact sink, with "key" generalized to
"any shared LSH band".

At 100 TB the store is the only growing state: it holds N_BANDS small
rows per admitted doc, partitioned by band, and the probe prunes to the
batch's bands — O(batch · store_fraction) per tick, never O(store).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .atomic import SnapshotStore


def band_keys(docs: DataFrame) -> DataFrame:
    """(doc_id, band, key) — each document's LSH band bucket keys.

    Delegates to the ONE band-row builder (operators/dedup.py::_band_rows)
    the batch star-edge builder and the incremental contraction also use:
    every path that must land in the SAME buckets shares the construction,
    so a banding-scheme change cannot desynchronize them."""
    from ..operators.dedup import _band_rows

    return _band_rows(docs)


class NearDupIngestSink:
    """Parquet-backed corpus + signature store with per-batch LSH dedup.

    State is directory-per-batch (the shared SnapshotStore discipline,
    streaming/atomic.py) rather than plain appends: the old
    corpus-append-then-store-append pair had a crash WINDOW between the
    two writes — corpus rows durable with no bands meant the redelivery
    re-admitted them (duplicates); the reverse order lost them. With
    committed per-batch dirs and STRICTLY-BELOW probe reads, a
    redelivered batch sees the same prior store, recomputes the same
    admissions, and overwrites its own dirs bit-identically — every
    crash point heals."""

    def __init__(self, spark: SparkSession, corpus_path: str, store_path: str):
        self.spark = spark
        self.corpus_path = corpus_path
        self.store_path = store_path
        self._corpus = SnapshotStore(spark, corpus_path, "batch_id")
        self._store = SnapshotStore(spark, store_path, "batch_id")

    def _store_below(self, batch_id: int) -> DataFrame | None:
        """Union of the committed store dirs STRICTLY below `batch_id` —
        the replay-safe probe input (a redelivery probing state its first
        delivery wrote would collide with its own bands and emit empty)."""
        ids = [i for i in self._store.ids() if i < batch_id]
        if not ids:
            return None
        return self.spark.read.option("basePath", self.store_path).parquet(
            *[self._store.path(i) for i in ids]
        )

    def read_corpus(self) -> DataFrame:
        return self._corpus.read_all().drop("batch_id")

    def process_batch(self, batch: DataFrame, batch_id: int = 0) -> None:
        """foreachBatch body: admit only documents that collide with no
        stored band and, within the batch, are their band-group's min id."""
        bk = band_keys(batch).localCheckpoint()  # signatures computed once

        # In-batch collapse: within each (band, key) group keep the min
        # doc_id; a doc survives only if it wins EVERY band it appears in
        # (i.e. it collides with no smaller in-batch doc).
        in_batch_min = bk.groupBy("band", "key").agg(F.min("doc_id").alias("min_id"))
        losers = (
            bk.join(in_batch_min, ["band", "key"])
            .where(F.col("doc_id") != F.col("min_id"))
            .select("doc_id")
            .distinct()
        )
        survivors = bk.join(losers, "doc_id", "left_anti")

        store = self._store_below(batch_id)
        if store is not None:
            # Store side is partitioned by band → the probe read prunes to
            # the batch's bands; the batch side is tiny → broadcast it.
            hit = (
                store.join(
                    F.broadcast(survivors.select("band", "key").distinct()),
                    ["band", "key"],
                    "left_semi",
                )
                .select("band", "key")
                .distinct()
            )
            dup_ids = (
                survivors.join(F.broadcast(hit), ["band", "key"], "left_semi")
                .select("doc_id")
                .distinct()
            )
            admitted_bk = survivors.join(dup_ids, "doc_id", "left_anti")
        else:
            admitted_bk = survivors

        admitted_ids = admitted_bk.select("doc_id").distinct().localCheckpoint()
        admitted_docs = batch.join(admitted_ids, "doc_id", "left_semi")

        self._corpus.write(admitted_docs, batch_id)
        admitted_bk.select("band", "key", "doc_id").write.mode(
            "overwrite"
        ).partitionBy("band").parquet(self._store.path(batch_id))
