"""Parquet-backed deal state table with idempotent merge semantics.

The reference's single mutable PostgreSQL table becomes a parquet directory
maintained by two write shapes (no Delta in this environment, so MERGE is
read-modify-write — the tradeoff SURVEY.md §7 Phase 4 documents):

  * `append_dedup` — the ON-CONFLICT-DO-NOTHING ingest sink (T6): anti-join
    the incoming batch against the stored keys, append only new rows. Plain
    parquet append is atomic-enough here (new part-files), and the anti-join
    makes replays idempotent — at-least-once delivery × keyed dedup =
    effectively-once, exactly the reference's guarantee.
  * `merge_overwrite` — the UPDATE shapes (S7/S8): rewrite the table with
    merge_update applied, staged to a temp dir then swapped.

At 100 TB the same interface maps onto partition-scoped rewrites: partition
the table by an epoch bucket, and both shapes touch only the partitions a
batch intersects (micro-batches are epoch-contiguous, so that's O(batch),
not O(table)). With a Delta/Iceberg catalog both become native MERGE.
"""

from __future__ import annotations

import os
import shutil
import uuid
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

from ..operators.merge import DEAL_KEY, dedup_insert, merge_update


class DealTableSink:
    def __init__(self, spark: SparkSession, path: str, key: Sequence[str] = DEAL_KEY):
        self.spark = spark
        self.path = path
        self.key = list(key)

    def exists(self) -> bool:
        return os.path.exists(os.path.join(self.path, "_SUCCESS")) or (
            os.path.isdir(self.path) and any(f.endswith(".parquet") for f in os.listdir(self.path))
        )

    def read(self) -> DataFrame:
        return self.spark.read.parquet(self.path)

    def append_dedup(self, batch: DataFrame) -> None:
        """Idempotent dedup-insert of one (micro-)batch."""
        if not self.exists():
            batch.dropDuplicates(self.key).write.mode("overwrite").parquet(self.path)
            return
        new_rows = dedup_insert(batch, self.read(), self.key)
        new_rows.write.mode("append").parquet(self.path)

    def merge_overwrite(self, updates: DataFrame, on: Sequence[str]) -> None:
        """MERGE WHEN MATCHED THEN UPDATE via staged rewrite."""
        merged = merge_update(self.read(), updates, list(on))
        tmp = f"{self.path}__stage_{uuid.uuid4().hex[:8]}"
        merged.write.mode("overwrite").parquet(tmp)
        old = f"{self.path}__old_{uuid.uuid4().hex[:8]}"
        os.rename(self.path, old)
        os.rename(tmp, self.path)
        shutil.rmtree(old)

    def count(self) -> int:
        return self.read().count() if self.exists() else 0
