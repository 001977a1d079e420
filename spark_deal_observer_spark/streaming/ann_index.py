"""Streaming ANN index maintenance: encode each micro-batch of NEW vectors
against the PUBLISHED coarse quantizer and PQ codebooks and append the
(vec_id, cell, m, code) rows to the cell-partitioned compressed index —
the online leg of `operators/quantization.py::ivf_pq_topk`, and the
fourth consumer of the train-once pattern (scoring, drift, cardinality
are the others): a real deployment retrains its quantizers OFFLINE per
corpus snapshot and streams encodes against the frozen model, because a
batch-trained quantizer would re-cluster (and silently re-code) the whole
index on every tick.

Per tick the plan is two broadcast-join aggregates over the batch (the
argmax-cosine cell assignment and the argmin-L2 code assignment — both
map-side-combinable, no window) and one vec_id-keyed join; nothing wider
than the batch ever shuffles. Batch output is written
`batch_id=N/cell=C/` — batch_id is the idempotent replay unit (an
at-least-once redelivery overwrites the same directory with bit-identical
rows, the same layout discipline as DriftMonitorSink), and the cell
partitioning makes the search side's probe filter PARTITION PRUNING on
the stored index, exactly the 100 TB layout the batch operator's
docstring promises.

Restart recovery is the read side: the index is the union of all durable
batch directories, so a new sink instance over the same path serves
queries over everything previously ingested with no state rebuild.

RETRAIN TRIGGER: frozen quantizers degrade silently as the traffic
distribution moves away from the trained corpus, so each tick also
appends a drift row — the cosine shift between the batch's rounded mean
embedding and the trained baseline's (`operators/quantization.py::
ann_incremental`'s statistic, the `embedding_source_drift` arithmetic) —
with `retrain_due` flagged past INC_DRIFT_THRESHOLD. The monitor only
FLAGS: retraining re-codes the whole index and belongs to the offline
snapshot pass, exactly where a production system schedules it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.quantization import (
    INC_DRIFT_THRESHOLD,
    _l2_spark,
    _mean_vec_spark,
    _pq_assign,
    _pq_fit,
    _subvectors,
)
from ..operators.similarity import _kmeans_assign, _kmeans_fit, cosine_spark
from .atomic import SnapshotStore


class AnnIndexMaintenanceSink:
    """foreachBatch body: encode new vectors against the published
    quantizers and append them to the cell-partitioned IVF-PQ index."""

    def __init__(
        self,
        spark: SparkSession,
        baseline_emb: DataFrame,
        out_path: str,
        n_cells: int = 8,
        n_iter: int = 2,
    ):
        self.spark = spark
        self.out_path = out_path
        # Train (or fetch) the session-published models ONCE — micro-batches
        # only encode. Both ladders are the same artifacts ivf_pq_topk /
        # kmeans_cells / pq_codes consume, so a pipeline running batch
        # queries next to this sink trains nothing twice.
        self.cents, _ = _kmeans_fit(baseline_emb, n_cells, n_iter)
        self.cb = _pq_fit(baseline_emb)
        self._drift = SnapshotStore(spark, f"{out_path}_drift", "batch_id")
        self._base_mean = _mean_vec_spark(
            baseline_emb.select("vec_id", "embedding"), "bv"
        ).localCheckpoint(eager=True)

    def process_batch(self, batch: DataFrame, batch_id: int = 0) -> None:
        if batch.isEmpty():
            return
        vecs = batch.select("vec_id", "embedding")
        assigned = _kmeans_assign(vecs, self.cents).select("vec_id", "cell")
        codes = _pq_assign(_subvectors(vecs), self.cb).select(
            "vec_id", "m", "code"
        )
        rows = assigned.join(codes, "vec_id").select(
            "vec_id", F.col("cell").cast("int").alias("cell"), "m", "code"
        )
        # overwrite-per-batch_id: replayed batches land bit-identical in the
        # same directory — at-least-once delivery, effectively-once index.
        rows.write.mode("overwrite").partitionBy("cell").parquet(
            f"{self.out_path}/batch_id={batch_id}"
        )
        drift_row = (
            _mean_vec_spark(vecs, "nv")
            .crossJoin(F.broadcast(self._base_mean))
            .selectExpr(
                f"ROUND(1 - ({cosine_spark('bv', 'nv')}), 6) AS drift",
            )
            .crossJoin(batch.agg(F.count("*").cast("bigint").alias("n_vecs")))
            .select(
                "n_vecs",
                "drift",
                (F.col("drift") >= F.lit(INC_DRIFT_THRESHOLD)).alias(
                    "retrain_due"
                ),
            )
        )
        self._drift.write(drift_row, batch_id)

    def read_drift(self) -> DataFrame:
        """(batch_id, n_vecs, drift, retrain_due) per ingested batch —
        empty typed before the first batch."""
        if self._drift.ids():
            return self._drift.read_all()
        return self.spark.createDataFrame(
            [], "n_vecs BIGINT, drift DOUBLE, retrain_due BOOLEAN, batch_id INT"
        )

    def read_index(self) -> DataFrame:
        """(vec_id, cell, m, code) across every COMMITTED batch directory
        — a torn batch dir (crash mid-commit) would otherwise serve
        PARTIAL codes to searches until its redelivery overwrites it."""
        store = SnapshotStore(self.spark, self.out_path, "batch_id")
        ids = store.ids()
        paths = (
            [store.path(i) for i in ids]
            if ids
            else [f"{self.out_path}/batch_id=*"]
        )
        return self.spark.read.option("basePath", self.out_path).parquet(
            *paths
        )

    def search(
        self, query: DataFrame, k: int = 10, n_probe: int = 2
    ) -> DataFrame:
        """ADC top-k over the MAINTAINED index for a 1-row (vec_id,
        embedding) query: probe the n_probe nearest trained cells (the
        `cell=` filter is partition pruning on the stored layout), look
        distances up in the broadcast M·K table, TakeOrdered the sums."""
        qid = query.select("vec_id").first()[0]
        probe = (
            self.cents.crossJoin(F.broadcast(query.select(F.col("embedding").alias("qvec"))))
            .select("cell", F.expr(cosine_spark("cvec", "qvec")).alias("aff"))
            .orderBy(F.col("aff").desc(), F.col("cell"))
            .limit(n_probe)
            .select(F.col("cell").cast("int").alias("cell"))
        )
        qsub = _subvectors(query.select("vec_id", "embedding")).select(
            "m", F.col("sub").alias("qsub")
        )
        dtab = self.cb.join(F.broadcast(qsub), "m").select(
            "m", "code", F.expr(_l2_spark("qsub", "cvec")).alias("d")
        )
        return (
            self.read_index()
            .join(F.broadcast(probe), "cell")
            .where(F.col("vec_id") != qid)
            .join(F.broadcast(dtab), ["m", "code"])
            .groupBy("vec_id")
            .agg(F.round(F.sum("d"), 6).alias("adc_dist"))
            .orderBy(F.col("adc_dist").asc(), F.col("vec_id"))
            .limit(k)
        )
