"""Streaming transition-matrix maintenance: the incremental twin of
`operators/sessions.py::event_transition_matrix`. The subtlety is the
CROSS-BATCH transition — a user's first event in batch N continues from
their last event in batch N−1 — so the sink keeps two durable snapshot
stores: the accumulated (prev, next) pair counts (mergeable by sum) and
the per-user LAST event (user-cardinality-bounded). Each tick unions the
stored last-events ahead of the batch, runs the same per-user lag window
as the batch operator, counts only the transitions whose TARGET row is a
batch event (stored rows contribute context, never counts — no double
counting), sums into the count store, and advances the last-event store.

Snapshots are keyed by batch_id and every tick reads the snapshot
STRICTLY BELOW its own id (the line-dedup replay rule): redelivered
batches see the same prior state and rewrite bit-identical snapshots —
effectively-once counting with no ledger. With time-ordered arrival the
maintained matrix equals the batch operator over the ingested union
(pinned in tests/test_streaming_transitions.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .atomic import SnapshotStore


class TransitionMonitorSink:
    """foreachBatch body: maintain (prev, next) counts + per-user last."""

    def __init__(
        self, spark: SparkSession, out_path: str, keep_snapshots: int | None = None
    ):
        self.spark = spark
        self.counts = f"{out_path}/counts"
        self.last = f"{out_path}/last"
        self.keep = keep_snapshots  # None = audit history; int = bounded disk
        # shared snapshot protocol (streaming/atomic.py): committed-only
        # selection + strictly-below replay reads + empty-typed pre-ingest
        self._counts = SnapshotStore(spark, self.counts)
        self._last = SnapshotStore(spark, self.last)

    def process_batch(self, batch: DataFrame, batch_id: int = 0) -> None:
        if batch.isEmpty():
            return
        from pyspark.sql.window import Window

        cols = ["user_id", "ts", "event_id", "event_type"]
        last = self._last.read_prior(
            batch_id,
            "user_id BIGINT, ts TIMESTAMP_NTZ, event_id BIGINT, event_type STRING",
        )
        combined = (
            last.select(*cols).withColumn("is_stored", F.lit(True))
            .unionByName(
                batch.select(*cols).withColumn("is_stored", F.lit(False))
            )
            .localCheckpoint(eager=True)
        )
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        batch_counts = (
            combined.select(
                "is_stored",
                F.lag("event_type").over(w).alias("prev_type"),
                F.col("event_type").alias("next_type"),
            )
            .where(~F.col("is_stored") & F.col("prev_type").isNotNull())
            .groupBy("prev_type", "next_type")
            .agg(F.count("*").cast("bigint").alias("n"))
        )
        stored = self._counts.read_prior(
            batch_id, "prev_type STRING, next_type STRING, n BIGINT"
        )
        merged = (
            stored.unionByName(batch_counts)
            .groupBy("prev_type", "next_type")
            .agg(F.sum("n").cast("bigint").alias("n"))
        )
        self._counts.write(merged, batch_id)
        if self.keep:
            self._counts.gc(self.keep)
        new_last = (
            combined.withColumn(
                "rn",
                F.row_number().over(
                    Window.partitionBy("user_id").orderBy(
                        F.col("ts").desc(), F.col("event_id").desc()
                    )
                ),
            )
            .where(F.col("rn") == 1)
            .select(*cols)
        )
        self._last.write(new_last, batch_id)
        if self.keep:
            self._last.gc(self.keep)

    def read_matrix(self) -> DataFrame:
        """(prev_type, next_type, n, p) over everything ingested; empty
        (same schema) before any batch has been processed."""
        counts = self._counts.read_latest(
            "prev_type STRING, next_type STRING, n BIGINT"
        )
        if counts.isEmpty():
            return self.spark.createDataFrame(
                [], "prev_type STRING, next_type STRING, n BIGINT, p DOUBLE"
            )
        totals = counts.groupBy("prev_type").agg(F.sum("n").alias("tot"))
        return counts.join(F.broadcast(totals), "prev_type").select(
            "prev_type",
            "next_type",
            "n",
            F.round(F.col("n") / F.col("tot"), 6).alias("p"),
        )
