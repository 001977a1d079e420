"""Streaming drift monitoring: PSI of each micro-batch's token-count
distribution against the PUBLISHED baseline distribution — the online
companion of `operators/profile.py::source_drift_psi`, and the second
consumer of the train-once pattern (`streaming/scoring.py` is the first):
the baseline is computed ONCE from the reference corpus via the artifact
registry; micro-batches never recompute it (a batch-derived baseline
would make every batch drift-free by construction).

Per batch the plan is one conditional-sum aggregate over the batch (its
dense bin distribution), the broadcast 1-row baseline, and a |bins|-element
fold — no state store, no shuffle wider than the bin count. The sink
appends one (batch_id, n_docs, psi) row per batch; an alert threshold is a
read-side filter, kept out of the write path so the monitor itself never
drops data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.models import published
from ..operators.profile import PSI_BINS, PSI_SMOOTH, _tok_bin
from .atomic import SnapshotStore


def _dense_distribution(docs: DataFrame) -> DataFrame:
    """1-row (p double[n_bins]): the smoothed token-count bin distribution."""
    nb = len(PSI_BINS)
    b = F.expr(_tok_bin("spark"))
    return (
        docs.select(b.alias("bin"))
        .agg(
            F.count("*").alias("tot"),
            *[
                F.sum(F.when(F.col("bin") == i, 1).otherwise(0)).alias(f"c{i}")
                for i in range(nb)
            ],
        )
        .select(
            F.array(
                *[(F.col(f"c{i}") / F.col("tot") + PSI_SMOOTH) for i in range(nb)]
            ).alias("p")
        )
    )


def baseline_distribution(docs: DataFrame) -> DataFrame:
    """The published reference-corpus distribution (1 row, checkpointed)."""
    return published(
        docs,
        "drift_baseline",
        (PSI_BINS, PSI_SMOOTH),
        lambda: _dense_distribution(docs).localCheckpoint(eager=True),
    )


class DriftMonitorSink:
    """foreachBatch body: append each micro-batch's PSI vs the baseline."""

    def __init__(self, spark: SparkSession, baseline_docs: DataFrame, out_path: str):
        self.spark = spark
        self.out_path = out_path
        self._reports = SnapshotStore(spark, out_path, "batch_id")
        self.baseline = baseline_distribution(baseline_docs)

    def process_batch(self, batch: DataFrame, batch_id: int = 0) -> None:
        if batch.isEmpty():
            # an empty micro-batch has no distribution: tot=0 would divide
            # to a NULL psi row that pollutes downstream alert filters —
            # record the tick explicitly as (0 docs, psi 0.0) instead
            self._reports.write(
                self.spark.createDataFrame(
                    [(0, 0.0)], "n_docs BIGINT, psi DOUBLE"
                ),
                batch_id,
            )
            return
        q = self.baseline.select(F.col("p").alias("q"))
        fold = F.expr(
            "ROUND(aggregate(zip_with(p, q, (pv, qv) -> (pv - qv) * ln(pv / qv)), "
            "CAST(0 AS DOUBLE), (acc, v) -> acc + v), 6)"
        )
        # batch_id lives in the partition directory (idempotent replay unit),
        # not the data — basePath-read re-derives it as a column.
        row = (
            _dense_distribution(batch)
            .crossJoin(F.broadcast(q))
            .select(fold.alias("psi"))
            .crossJoin(batch.agg(F.count("*").cast("bigint").alias("n_docs")))
            .select("n_docs", "psi")
        )
        self._reports.write(row, batch_id)

    def read_report(self) -> DataFrame:
        return self._reports.read_all()
