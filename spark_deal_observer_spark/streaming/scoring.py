"""Streaming model scoring: score each micro-batch with the OFFLINE-trained
quality classifier — the online half of the train-once/score-forever
pattern (reference analog: the enrichment loops apply a fixed external
model per tick, deal-observer-backend.js:70-139; here the model is ours).

Design contract:
  * the model (GD weights + TRAIN-corpus standardization stats) is trained
    once from the reference corpus via the session artifact registry
    (`operators/models.py`) — micro-batches NEVER refit or recompute
    stats; a batch that recomputed its own mean/stddev would score on a
    different feature scale per batch (train/serve skew);
  * per batch the plan is scan-stage feature extraction + two broadcast
    1-row joins + the sigmoid — no aggregation over the batch, no state;
  * idempotent under at-least-once replay: each batch writes
    `out_path/batch_id=N` with overwrite, the same effectively-once
    discipline as `streaming/sink.py`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.classifier import score_with_model, trained_model
from .atomic import SnapshotStore


class ModelScoringSink:
    """foreachBatch body: score micro-batches with the published model."""

    def __init__(self, spark: SparkSession, train_docs: DataFrame, out_path: str):
        self.spark = spark
        self.out_path = out_path
        self._reports = SnapshotStore(spark, out_path, "batch_id")
        # Train (or fetch the published artifact) ONCE at sink construction.
        self.stats, self.weights = trained_model(train_docs)

    def process_batch(self, batch: DataFrame, batch_id: int = 0) -> None:
        self._reports.write(
            score_with_model(batch, self.stats, self.weights), batch_id
        )

    def read_scores(self) -> DataFrame:
        return self._reports.read_all()


class DsirScoringSink:
    """foreachBatch body: DSIR-score micro-batches with the published model
    — the online half of importance-based data selection: an ingestion
    pipeline scores arriving documents against the OFFLINE-trained target
    /raw feature LMs and admits by weight, never refitting per batch.

    Same contract as `ModelScoringSink`: the model (DSIR_M-row delta table
    + the smoothed default for buckets unseen in training) comes from the
    session artifact registry at sink construction; per batch the plan is
    the scan-stage feature extractor, one broadcast join, one per-doc
    aggregate; `out_path/batch_id=N` overwrite keeps replays
    effectively-once."""

    def __init__(self, spark: SparkSession, train_docs: DataFrame, out_path: str):
        from ..operators.corpus import dsir_model

        self.spark = spark
        self.out_path = out_path
        self._reports = SnapshotStore(spark, out_path, "batch_id")
        self.delta_df, self.default_delta = dsir_model(train_docs)

    def process_batch(self, batch: DataFrame, batch_id: int = 0) -> None:
        from ..operators.corpus import score_with_dsir

        self._reports.write(
            score_with_dsir(batch, self.delta_df, self.default_delta), batch_id
        )

    def read_scores(self) -> DataFrame:
        return self._reports.read_all()
