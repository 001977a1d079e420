"""Streaming token-budget admission: the online half of the quality-ordered
budget gate (operators/corpus.py::budget_admission) — an ingestion pipeline
admits arriving documents best-first until a global token budget is spent,
then closes.

Semantics contract:
  * WITHIN a micro-batch, admission is exactly the batch's descending-
    quality prefix that fits the remaining budget — computed with the
    two-phase global prefix sum (operators/prefix.py), never a single-
    partition window, so an arbitrarily large batch still scales;
  * ACROSS batches, arrival order wins (a later, better doc cannot evict
    an admitted one) — the inherent online-vs-offline gap, documented
    rather than hidden: the offline `corpus_budget_admission` is the
    globally optimal reference;
  * admission consumes budget, so replay is NOT idempotent by re-merge —
    the sink keeps a processed-batch ledger (same discipline as the CMS
    monitor, streaming/frequency.py) and recovers both the ledger and the
    consumed total from its own durable output on restart.

Reference analog: the observer's submit loop admits deals page by page
against an external acceptance budget (spark-api-submit-deals.js:17-29).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import quality_sql
from ..operators.prefix import global_prefix_sum
from .atomic import SnapshotStore


class BudgetAdmissionSink:
    """foreachBatch body: quality-ordered admission under a token budget."""

    def __init__(self, spark: SparkSession, budget: int, out_path: str):
        self.spark = spark
        self.budget = int(budget)
        self.out_path = out_path
        self._store = SnapshotStore(spark, f"{out_path}/admitted", "batch_id")
        # committed dirs only: a torn batch dir (crash mid-commit) must be
        # redelivered and overwritten, not counted as applied — and its
        # partial rows must not inflate the recovered consumed total
        self._applied: set[int] = set(self._store.ids())
        self._consumed = 0
        if self._applied:
            paths = [self._store.path(i) for i in sorted(self._applied)]
            row = (
                self.spark.read.option("basePath", self._store.base)
                .parquet(*paths)
                .agg(F.sum("n_tokens"))
                .first()
            )
            self._consumed = int(row[0] or 0)

    def process_batch(self, batch: DataFrame, batch_id: int = 0) -> None:
        if batch_id in self._applied:
            return  # consuming budget twice would double-spend: ledger first
        remaining = self.budget - self._consumed
        q = quality_sql("spark", "text")
        d = batch.select(
            "doc_id",
            F.expr(q["n_tokens"]).cast("bigint").alias("n_tokens"),
            F.round(F.expr(q["quality_score"]), 6).alias("quality_score"),
        )
        admitted = global_prefix_sum(
            d,
            [F.col("quality_score").desc(), F.col("doc_id")],
            "n_tokens",
            "cum_tokens",
        ).where(F.col("cum_tokens") <= F.lit(remaining))
        self._store.write(admitted, batch_id)
        spent = (
            self._store.read(batch_id).agg(F.sum("n_tokens")).first()[0]
        )
        self._consumed += int(spent or 0)
        self._applied.add(batch_id)

    def read_admitted(self) -> DataFrame:
        return self._store.read_all()
