"""Streaming cluster maintenance: fold each micro-batch into the
accumulated near-dup clustering by supernode contraction — the continuous
form of `operators/dedup.py::incremental_clusters` (same construction,
same equality proof), and the label-map companion of the admit/reject
`NearDupIngestSink`: that sink answers "is this new doc a duplicate",
this one maintains WHICH docs form each duplicate group as the corpus
grows, so survivor selection (canonical_pick) can run at any tick without
a from-scratch connected-components pass.

State (both under the shared SnapshotStore protocol, streaming/atomic.py):

  * bands/  — per-batch (doc_id, band, key) dirs: the accumulated LSH
              index, identical layout to the ingest sink's store.
  * labels/ — per-batch FULL (doc_id, cluster) snapshots: the maintained
              artifact consumers read. Label rows exist only for docs in
              some multi-member bucket (the batch operator's domain), so
              the snapshot is duplicate-population-sized, not
              corpus-sized; `keep_snapshots` bounds disk like every other
              snapshot sink.

Per tick (foreachBatch body):

  1. band-key the batch (one signature pass);
  2. touched buckets = the batch's (band, key) set; members = prior
     bands semi-joined to touched ∪ the batch's own rows — the FULL
     current membership of every touched bucket;
  3. per-bucket star edges over those members (connectivity-equivalent
     to the clique, O(k) edges per bucket);
  4. contract corpus endpoints through the prior label snapshot
     (strictly-below read), run min-label CC over the contracted delta
     graph — O(|batch| + touched clusters) nodes, independent of corpus
     or graph size;
  5. expand: relabel prior components through the delta fixpoint, emit
     delta-only nodes directly; write the new full snapshot.

Replay idempotence: both reads are strictly-below, both writes are
per-batch-dir overwrites — a redelivered batch recomputes bit-identical
state (no ledger needed; the merge is deterministic). Equality with the
batch operator: each touched bucket's star at its LAST touch spans all
its members, earlier partial stars are connectivity-subsets of it, so
the accumulated edge union has the connected components of the final
full-bucket graph — the same argument `incremental_clusters`' oracle
proves at value level, pinned here by the streamed-vs-batch test."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import _star, fold_clusters
from .atomic import SnapshotStore
from .dedup_ingest import band_keys

_LABEL_SCHEMA = "doc_id BIGINT, cluster BIGINT"
_BAND_SCHEMA = "doc_id BIGINT, band INT, key STRING"


class ClusterMaintSink:
    """Parquet-backed LSH band index + maintained cluster-label map."""

    def __init__(
        self,
        spark: SparkSession,
        bands_path: str,
        labels_path: str,
        max_iter: int = 25,
        keep_snapshots: int | None = None,
    ):
        self.spark = spark
        self._bands = SnapshotStore(spark, bands_path, "batch_id")
        self._labels = SnapshotStore(spark, labels_path, "batch_id")
        self.max_iter = max_iter
        self.keep_snapshots = keep_snapshots

    def _bands_below(self, batch_id: int) -> DataFrame:
        ids = [i for i in self._bands.ids() if i < batch_id]
        if not ids:
            return self.spark.createDataFrame([], _BAND_SCHEMA)
        return (
            self.spark.read.option("basePath", self._bands.base)
            .parquet(*[self._bands.path(i) for i in ids])
            .select("doc_id", "band", "key")
        )

    def read_labels(self) -> DataFrame:
        """The maintained cluster map — latest committed snapshot, empty
        typed frame before the first tick (the transitions-fix rule)."""
        return self._labels.read_latest(_LABEL_SCHEMA)

    def process_batch(self, batch: DataFrame, batch_id: int = 0) -> None:
        bk = band_keys(batch).localCheckpoint()
        prior_bands = self._bands_below(batch_id)
        prior_labels = self._labels.read_prior(batch_id, _LABEL_SCHEMA)

        touched_keys = bk.select("band", "key").distinct()
        members = prior_bands.join(
            F.broadcast(touched_keys), ["band", "key"], "left_semi"
        ).unionByName(bk)
        # shared construction (operators/dedup.py): per-bucket star over
        # the touched members, then contract/fold through the prior label
        # map — one implementation for the batch twin and this sink, so
        # the streamed-vs-batch equality can't drift between two copies
        labels = fold_clusters(_star(members), prior_labels, self.max_iter)

        self._labels.write(labels, batch_id)
        bk.write.mode("overwrite").parquet(self._bands.path(batch_id))
        if self.keep_snapshots is not None:
            self._labels.gc(self.keep_snapshots)
            # band dirs are the probe corpus, not replay-dead history —
            # never GC'd (the index IS the state, unlike label snapshots
            # where only the latest is live)
