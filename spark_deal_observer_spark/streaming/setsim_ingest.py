"""Streaming EXACT near-duplicate suppression at ingest: prefix-filtered
set-similarity probe per micro-batch against the accumulated inverted
index — the LOSSLESS sibling of the banded-LSH ingest sink
(streaming/dedup_ingest.py::NearDupIngestSink).

The LSH sink keeps N_BANDS small rows per admitted document and can admit
a true near-duplicate (candidate recall < 1 by design); this sink keeps
the full token postings — O(|distinct shingle set|) rows per admitted
document — and NEVER admits a document within Jaccard ≥ threshold of the
accepted corpus. That state-for-recall trade is the whole point of having
both tiers: run the LSH sink on the bulk feed, this one on feeds where a
missed duplicate is unaffordable (eval/benchmark decontamination gates).

Losslessness under continuous ingestion: the STORE side is the FULL
inverted index, so the prefix filter is applied only to the PROBE side —
the smallest-shared-token argument then needs no shared global order
(any batch-side order works: if J(A,B) ≥ t, the smallest shared token
under the probe's own order sits inside A's prefix, and it trivially hits
B's full postings). Prefixing the STORE too would tie correctness to a
frequency order that drifts as the store grows. Production note: probing
in ascending-df order (a periodically refreshed, possibly STALE df
snapshot — staleness affects candidate volume, never correctness) cuts
the candidate join; this sink uses token-value order for determinism.

Crash/replay safety is the shared SnapshotStore discipline
(streaming/atomic.py): directory-per-batch committed writes, probes read
committed dirs STRICTLY below the tick's batch_id, so a redelivered batch
recomputes the same admissions and overwrites its own dirs
bit-identically — and a document re-sent in a LATER batch collides with
its own stored postings at Jaccard 1.0 and is rejected.

Reference analog: the effectively-once INSERT sink contract
(backend/lib/deal-observer.js:67-88) with "key" generalized from exact
identity to Jaccard-threshold similarity; batch twin
operators/dedup.py::setsim_incremental.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import hashed_shingles_sql
from ..operators.dedup import SETSIM_THRESHOLD, setsim_probe
from .atomic import SnapshotStore

SETS_SCHEMA = "doc_id BIGINT, sh ARRAY<BIGINT>, n INT"
POSTINGS_SCHEMA = "tok BIGINT, doc_id BIGINT, n INT"


def setsim_sets_plain(docs: DataFrame) -> DataFrame:
    """(doc_id, sh, n): distinct sorted hashed-shingle sets computed
    in-plan (no artifact registry) — micro-batches are transient inputs;
    publishing per-tick frames would churn the session registry."""
    sh = F.array_sort(
        F.array_distinct(F.expr(hashed_shingles_sql("spark", "text")))
    )
    return docs.select("doc_id", sh.alias("sh")).select(
        "doc_id", "sh", F.size("sh").alias("n")
    )


class SetSimIngestSink:
    """Parquet-backed corpus + full-postings store with per-batch EXACT
    set-similarity dedup."""

    def __init__(self, spark: SparkSession, base_path: str,
                 threshold: float = SETSIM_THRESHOLD):
        self.spark = spark
        self.threshold = threshold
        self._corpus = SnapshotStore(spark, f"{base_path}/corpus", "batch_id")
        self._postings = SnapshotStore(spark, f"{base_path}/postings", "batch_id")
        self._sets = SnapshotStore(spark, f"{base_path}/sets", "batch_id")

    def _below(self, store: SnapshotStore, batch_id: int,
               schema: str) -> DataFrame:
        ids = [i for i in store.ids() if i < batch_id]
        if not ids:
            return self.spark.createDataFrame([], schema)
        return self.spark.read.option("basePath", store.base).parquet(
            *[store.path(i) for i in ids]
        )

    def read_corpus(self) -> DataFrame:
        return self._corpus.read_all().drop("batch_id")

    def process_batch(self, batch: DataFrame, batch_id: int = 0) -> None:
        """foreachBatch body. In-batch rule (one pass, documented greedy
        approximation): a doc is dropped if it qualifies against ANY
        smaller in-batch doc_id — on q chains (a~b, b~c, a≁c) this can
        drop c where sequential greedy would keep it; the cross-batch
        probe below is exact."""
        bsets = setsim_sets_plain(batch).localCheckpoint()

        # in-batch exact pairs: tiny batch ⇒ token self-join + verify
        tok = bsets.select("doc_id", F.explode("sh").alias("tok"))
        cand = (
            tok.select(F.col("doc_id").alias("doc_a"), "tok")
            .join(tok.select(F.col("doc_id").alias("doc_b"), "tok"), "tok")
            .where(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b")
            .distinct()
        )
        sa = bsets.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
        sb = bsets.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
        inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
        jac = inter / (F.size("sh_a") + F.size("sh_b") - inter)
        losers = (
            cand.join(sa, "doc_a")
            .join(sb, "doc_b")
            .where(jac >= self.threshold)
            .select(F.col("doc_b").alias("doc_id"))
            .distinct()
        )
        survivors = bsets.join(losers, "doc_id", "left_anti")

        postings = self._below(self._postings, batch_id, POSTINGS_SCHEMA)
        csets = self._below(self._sets, batch_id, SETS_SCHEMA)
        # token-value probe order: df-free (see module docstring)
        no_df = self.spark.createDataFrame([], "tok BIGINT, df BIGINT")
        rejects = setsim_probe(
            survivors, postings, no_df, csets, self.threshold
        ).select(F.col("batch_doc").alias("doc_id"))
        admitted = survivors.join(rejects, "doc_id", "left_anti").localCheckpoint()

        self._corpus.write(
            batch.join(admitted.select("doc_id"), "doc_id", "left_semi"),
            batch_id,
        )
        self._sets.write(admitted, batch_id)
        self._postings.write(
            admitted.select(
                F.explode("sh").alias("tok"), "doc_id", "n"
            ),
            batch_id,
        )
