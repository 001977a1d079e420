"""Streaming PERCEPTUAL dedup at media ingest: admit only media whose
2-D grid-pHash band keys collide with nothing already admitted — the
online twin of `multimodal/media.py::phash_dedup_pairs_2d`, and the
media analog of the MinHash ingest sink (streaming/dedup_ingest.py).

Exact content-hash ingest dedup (the reference's ON-CONFLICT-DO-NOTHING
discipline generalized in streaming/sink.py) admits a RE-ENCODED or
resized duplicate because its payload bytes differ; this sink blocks on
the decoded content's perceptual signature instead, so the re-encode is
rejected at the door (pinned in tests/test_streaming_phash_ingest.py
with real PNG re-encodes through the from-scratch codec).

Per micro-batch:
  1. grid means  — the Arrow decode kernel emits gw·gh luminance means
                   per doc (the only Python stage; 64 doubles per doc);
  2. band keys   — circular dHash folded into 4 × 16-bit keys, pure JVM
                   column math (shared `phash_band_keys`);
  3. probe       — anti-join the batch's keys against the accumulated
                   band store: any shared (band, key) with an admitted
                   doc rejects the newcomer; within the batch the
                   smallest doc_id of a colliding group survives (the
                   greedy min-id discipline of the MinHash sink);
  4. admit       — surviving docs land in `admitted/batch_id=N`; the
                   store advances as `bands/snapshot=N`.

Replay/restart semantics are the shared SnapshotStore protocol
(streaming/atomic.py): the store read is STRICTLY BELOW the tick's
batch_id, so a redelivered batch sees the same prior state and rewrites
bit-identical outputs — effectively-once with no ledger; torn dirs are
invisible to selection and heal on overwrite.

At 100 TB: state is PHASH_BANDS small rows per admitted doc (16-byte
keys, band-partitionable); the probe joins the batch's keys against a
band-pruned store read — O(batch) per tick, never O(store).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..multimodal.media import media_grid_means, phash_band_keys
from .atomic import SnapshotStore

_STORE_SCHEMA = "doc_id BIGINT, band INT, bkey BIGINT"


class PerceptualDedupIngestSink:
    """foreachBatch body: perceptual-signature admission for media."""

    def __init__(
        self,
        spark: SparkSession,
        out_path: str,
        gw: int = 8,
        gh: int = 8,
        keep_snapshots: int | None = None,
    ):
        self.spark = spark
        self.gw, self.gh = gw, gh
        self.keep = keep_snapshots  # None = audit history; int = bounded disk
        self._store = SnapshotStore(spark, f"{out_path}/bands")
        self._admitted = SnapshotStore(spark, f"{out_path}/admitted", "batch_id")

    def process_batch(self, batch: DataFrame, batch_id: int = 0) -> None:
        if batch.isEmpty():
            return
        keys = phash_band_keys(
            media_grid_means(batch, self.gw, self.gh),
            n_bits=self.gw * self.gh,
        ).localCheckpoint(eager=True)
        seen = self._store.read_prior(batch_id, _STORE_SCHEMA)
        # store collision: ANY band shared with an admitted doc rejects
        store_hit = (
            keys.join(seen.select("band", "bkey"), ["band", "bkey"], "left_semi")
            .select("doc_id")
            .distinct()
        )
        # in-batch collision: the smallest doc_id sharing a band survives
        smaller = keys.select(
            "band", "bkey", F.col("doc_id").alias("rival")
        )
        batch_hit = (
            keys.join(smaller, ["band", "bkey"])
            .where(F.col("rival") < F.col("doc_id"))
            .select("doc_id")
            .distinct()
        )
        rejected = store_hit.unionByName(batch_hit).distinct()
        admitted = (
            batch.select("doc_id", F.md5("payload").alias("content_md5"))
            .join(rejected, "doc_id", "left_anti")
        )
        self._admitted.write(admitted, batch_id)
        new_bands = keys.join(
            self._admitted.read(batch_id).select("doc_id"), "doc_id", "left_semi"
        )
        self._store.write(seen.unionByName(new_bands), batch_id)
        if self.keep:
            self._store.gc(self.keep)

    def read_admitted(self) -> DataFrame:
        return self._admitted.read_all()
