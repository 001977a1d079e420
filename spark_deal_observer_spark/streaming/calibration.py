"""Streaming calibration monitoring: each micro-batch of documents is
scored by the PUBLISHED classifier and its per-probability-bin empirical
positive rate is compared against the training-time reliability table —
the online companion of `operators/classifier.py::calibration_report`,
and the drift family's model-quality member (drift.py watches the INPUT
distribution, this sink watches the MODEL's calibration on it: a model
can stay input-stable and still mis-calibrate on a shifted label mix).

The baseline reliability table is computed ONCE from the training corpus
via the artifact registry (train-once, like scoring.py / drift.py). Per
tick the plan is one scored-batch bin aggregate (map-side combinable,
≤ CALIB_BINS rows out), a broadcast join against the bin-sized baseline,
and one append; no state store. Batch output is `batch_id=N/` — the
idempotent replay unit shared with every monitor sink here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from .atomic import SnapshotStore
from pyspark.sql import functions as F

from ..operators.classifier import CALIB_BINS, calibration_report, classifier_scores
from ..operators.models import published


def baseline_calibration(docs: DataFrame) -> DataFrame:
    """(bin, frac_positive) of the training corpus, published + checkpointed."""
    return published(
        docs,
        "calibration_baseline",
        (CALIB_BINS,),
        lambda: calibration_report(docs)
        .select("bin", F.col("frac_positive").alias("train_frac"))
        .localCheckpoint(eager=True),
    )


class CalibrationMonitorSink:
    """foreachBatch body: append each micro-batch's per-bin reliability
    with its gap against the published training calibration."""

    def __init__(self, spark: SparkSession, baseline_docs: DataFrame, out_path: str):
        self.spark = spark
        self.out_path = out_path
        self._reports = SnapshotStore(spark, out_path, "batch_id")
        self.baseline = baseline_calibration(baseline_docs)

    def process_batch(self, batch: DataFrame, batch_id: int = 0) -> None:
        if batch.isEmpty():
            return
        scored = classifier_scores(batch)
        b = F.least(
            F.floor(F.col("prob") * CALIB_BINS).cast("int"),
            F.lit(CALIB_BINS - 1),
        )
        row = (
            scored.groupBy(b.alias("bin"))
            .agg(
                F.count("*").cast("bigint").alias("n"),
                F.round(F.avg(F.col("prob").cast("double")), 6).alias("mean_prob"),
                F.round(F.avg(F.col("label").cast("double")), 6).alias(
                    "frac_positive"
                ),
            )
            .join(F.broadcast(self.baseline), "bin", "left")
            .select(
                "bin",
                "n",
                "mean_prob",
                "frac_positive",
                F.round(
                    F.col("frac_positive") - F.coalesce("train_frac", F.lit(0.0)), 6
                ).alias("gap_vs_train"),
            )
        )
        self._reports.write(row, batch_id)

    def read_report(self) -> DataFrame:
        return self._reports.read_all()
