"""Catalog-table deal sink: partitioned AND bucketed — the full 100 TB
write shape.

`PartitionedDealTableSink` (sink.py) gives partition-scoped rewrites on a
plain path. This sink adds the catalog layout the reference's indexes map
to (SURVEY §2 S6/S7/S8 + db/migrations/007,014): the table is

    PARTITIONED BY (epoch_bucket)         -- prunes every merge to O(batch)
    CLUSTERED BY (id) INTO N BUCKETS      -- co-locates id-keyed merges:
                                             joining two same-bucketed
                                             tables plans SortMergeJoin
                                             with ZERO exchanges

and writes go through the catalog:
  * append  — `insertInto` (enforces the bucket spec on the new files)
  * merge   — `INSERT OVERWRITE` under dynamic partitionOverwriteMode:
              Spark itself replaces exactly the partitions present in the
              merged output, atomically per partition — the hand-rolled
              directory swap in sink.py becomes the engine's job.

The write path stays O(touched partitions); the read path gets bucket-
pruned joins for free (tests/test_catalog_sink.py asserts both).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.merge import DEAL_KEY, dedup_insert, merge_update

DEFAULT_TABLE = "deal_observer.active_deals_store"
PCOL = "epoch_bucket"


class CatalogDealTableSink:
    def __init__(
        self,
        spark: SparkSession,
        table: str = DEFAULT_TABLE,
        key: Sequence[str] = DEAL_KEY,
        bucket_width: int = 100,
        n_buckets: int = 8,
    ):
        self.spark = spark
        self.table = table
        self.key = list(key)
        self.bucket_width = bucket_width
        self.n_buckets = n_buckets

    # -- layout -------------------------------------------------------------

    def exists(self) -> bool:
        db = self.table.split(".")[0]
        return self.spark.catalog.databaseExists(db) and self.spark.catalog.tableExists(
            self.table
        )

    def _ensure(self, batch: DataFrame) -> None:
        db = self.table.split(".")[0]
        self.spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
        cols = ", ".join(
            f"{f.name} {f.dataType.simpleString()}" for f in batch.schema.fields
        )
        self.spark.sql(
            f"""CREATE TABLE IF NOT EXISTS {self.table} ({cols}, {PCOL} INT)
            USING PARQUET
            PARTITIONED BY ({PCOL})
            CLUSTERED BY (id) SORTED BY (id) INTO {self.n_buckets} BUCKETS"""
        )

    def _with_bucket(self, df: DataFrame) -> DataFrame:
        return df.withColumn(
            PCOL, F.expr(f"CAST(activated_at_epoch DIV {self.bucket_width} AS INT)")
        )

    def _table_cols(self) -> list[str]:
        return [f.name for f in self.spark.table(self.table).schema.fields]

    def read(self) -> DataFrame:
        return self.spark.table(self.table).drop(PCOL)

    def read_bucketed(self) -> DataFrame:
        """The raw bucketed scan — join this on `id` against another
        same-bucketed table and Catalyst plans zero exchanges."""
        return self.spark.table(self.table)

    def count(self) -> int:
        return self.read().count() if self.exists() else 0

    # -- write shapes --------------------------------------------------------

    def _buckets_of(self, df: DataFrame) -> list[int]:
        return [r[0] for r in df.select(PCOL).distinct().collect()]

    def append_dedup(self, batch: DataFrame) -> None:
        """ON CONFLICT DO NOTHING: anti-join against ONLY the batch's
        partitions (partition pruning on the catalog table), bucketed
        append through insertInto."""
        self._ensure(batch)
        batch = self._with_bucket(batch).dropDuplicates(self.key)
        buckets = self._buckets_of(batch)
        stored = self.spark.table(self.table).where(F.col(PCOL).isin(buckets))
        new_rows = dedup_insert(batch, stored, self.key)
        new_rows.select(*self._table_cols()).write.mode("append").insertInto(self.table)

    def merge_overwrite(self, updates: DataFrame, on: Sequence[str]) -> None:
        """MERGE WHEN MATCHED THEN UPDATE, partition-scoped by the engine:
        dynamic partition overwrite replaces exactly the partitions present
        in the merged output."""
        updates = self._with_bucket(updates)
        buckets = self._buckets_of(updates)
        base = self.spark.table(self.table).where(F.col(PCOL).isin(buckets))
        merged = merge_update(base, updates.select(*base.columns), list(on))
        mode_key = "spark.sql.sources.partitionOverwriteMode"
        prev = self.spark.conf.get(mode_key, "static")
        self.spark.conf.set(mode_key, "dynamic")
        try:
            merged.select(*self._table_cols()).write.mode("overwrite").insertInto(
                self.table
            )
        finally:
            self.spark.conf.set(mode_key, prev)

    def location(self) -> str:
        detail = self.spark.sql(f"DESCRIBE TABLE EXTENDED {self.table}").collect()
        loc = next(r.data_type for r in detail if r.col_name == "Location")
        return loc.removeprefix("file:")

    def drop(self) -> None:
        self.spark.sql(f"DROP TABLE IF EXISTS {self.table}")
