"""Versioned catalog DDL — the reference's schema-migration story (S12).

The reference boots by running Postgrator over db/migrations/001..015
(db/index.js:65-80). This module is the Spark-catalog analog: an ordered,
versioned migration list applied idempotently against the session catalog,
tracked in a `schema_migrations` table exactly like Postgrator's version
table.

Postgres → Spark translation choices, one per reference migration:

  001/002  CREATE TABLE active_deals            → CREATE TABLE ... USING
           PARQUET, CLUSTERED BY the composite lookup key INTO 32 BUCKETS
           (the bucketed layout is Spark's analog of the reference's hot-key
           indexes — see sources/bucketing.py).
  003      ALTER COLUMN sector_id TYPE BIGINT   → parquet tables can't
           retype in place; staged CTAS rewrite + RENAME, the honest Spark
           equivalent of Postgres's table rewrite under the hood.
  004      ADD COLUMN submitted_at              → ALTER TABLE ADD COLUMNS.
  005/006  epoch↔timestamp SQL functions        → CREATE FUNCTION (SQL UDF)
           with the same genesis/epoch constants as functions/epoch.py.
  007/010/013/014/015 CREATE INDEX              → recorded no-ops: Spark has
           no secondary indexes; the bucketed+partitioned layout and parquet
           min/max pruning carry these queries (SCALE.md documents which).
  008      UNIQUE constraint                    → recorded no-op: enforced
           by the dedup-insert anti-join invariant (operators/merge.py).
  009      payload retrievability enum + column → ADD COLUMNS with STRING
           state (enum values validated by sources/events.py's strict path).
  011      ADD reverted + backfill FALSE        → ADD COLUMNS + staged
           rewrite backfill (parquet has no in-place UPDATE).
  012      ADD COLUMN id SERIAL                 → ADD COLUMNS id BIGINT;
           ingest assigns ids (no auto-increment in a distributed store —
           the reference's SERIAL becomes the event id, which is unique).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import SparkSession

from ..functions.epoch import EPOCH_SECONDS, GENESIS_UNIX

DB = "deal_observer"
TABLE = f"{DB}.active_deals"
VERSIONS_TABLE = f"{DB}.schema_migrations"
N_BUCKETS = 32

Migration = tuple[int, str, Callable[[SparkSession], None]]


def _sql(*stmts: str) -> Callable[[SparkSession], None]:
    def run(spark: SparkSession) -> None:
        for s in stmts:
            spark.sql(s)

    return run


def _noop_indexed_by_layout(_spark: SparkSession) -> None:
    """Reference CREATE INDEX: carried by bucketing/partitioning, not DDL."""


def _rewrite(select_body: str) -> Callable[[SparkSession], None]:
    """Staged full-rewrite migration (type change / backfill): CTAS the new
    shape next to the table, drop the old, rename the stage in. At scale
    this is exactly what Postgres does under ALTER TYPE — a table rewrite —
    run as one distributed job."""

    def run(spark: SparkSession) -> None:
        stage = f"{TABLE}__stage"
        spark.sql(f"DROP TABLE IF EXISTS {stage}")
        spark.sql(
            f"CREATE TABLE {stage} USING PARQUET "
            f"CLUSTERED BY (miner_id, client_id, piece_cid, piece_size) "
            f"INTO {N_BUCKETS} BUCKETS AS SELECT {select_body} FROM {TABLE}"
        )
        spark.sql(f"DROP TABLE {TABLE}")
        spark.sql(f"ALTER TABLE {stage} RENAME TO {TABLE}")

    return run


MIGRATIONS: list[Migration] = [
    (1, "create-database", _sql(f"CREATE DATABASE IF NOT EXISTS {DB}")),
    (
        2,
        "active-deals",
        _sql(
            f"""CREATE TABLE IF NOT EXISTS {TABLE} (
              activated_at_epoch INT NOT NULL,
              miner_id INT NOT NULL,
              client_id INT NOT NULL,
              piece_cid STRING NOT NULL,
              piece_size BIGINT NOT NULL,
              term_start_epoch INT NOT NULL,
              term_min INT NOT NULL,
              term_max INT NOT NULL,
              sector_id INT NOT NULL,
              payload_cid STRING)
            USING PARQUET
            CLUSTERED BY (miner_id, client_id, piece_cid, piece_size)
            INTO {N_BUCKETS} BUCKETS"""
        ),
    ),
    (
        3,
        "change-sector-id-type",
        _rewrite(
            "activated_at_epoch, miner_id, client_id, piece_cid, piece_size, "
            "term_start_epoch, term_min, term_max, "
            "CAST(sector_id AS BIGINT) AS sector_id, payload_cid"
        ),
    ),
    (
        4,
        "active-deals-submitted-at",
        _sql(f"ALTER TABLE {TABLE} ADD COLUMNS (submitted_at TIMESTAMP_NTZ)"),
    ),
    (
        5,
        "epoch-to-timestamp",
        _sql(
            # DROP-then-CREATE (not OR REPLACE): Spark's function registry
            # caches dropped entries across DROP DATABASE CASCADE, and the
            # REPLACE path trips over the stale cache entry.
            f"DROP FUNCTION IF EXISTS {DB}.epoch_to_timestamp",
            f"""CREATE FUNCTION {DB}.epoch_to_timestamp(epoch BIGINT)
            RETURNS TIMESTAMP_NTZ
            RETURN timestampadd(SECOND, epoch * {EPOCH_SECONDS} + {GENESIS_UNIX},
                                TIMESTAMP_NTZ '1970-01-01 00:00:00')"""
        ),
    ),
    (
        6,
        "timestamp-to-epoch",
        _sql(
            f"DROP FUNCTION IF EXISTS {DB}.timestamp_to_epoch",
            f"""CREATE FUNCTION {DB}.timestamp_to_epoch(ts TIMESTAMP_NTZ)
            RETURNS BIGINT
            RETURN CAST((timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)
                         - {GENESIS_UNIX}) DIV {EPOCH_SECONDS} AS BIGINT)"""
        ),
    ),
    (7, "index-activated-at-epoch", _noop_indexed_by_layout),
    (8, "unique-constraint", _noop_indexed_by_layout),
    (
        9,
        "add-payload-retrievability-column",
        _sql(
            f"ALTER TABLE {TABLE} ADD COLUMNS ("
            "payload_retrievability_state STRING, "
            "last_payload_retrieval_attempt TIMESTAMP_NTZ)"
        ),
    ),
    (10, "index-missing-payloads", _noop_indexed_by_layout),
    (
        11,
        "add-reverted-column",
        _sql(f"ALTER TABLE {TABLE} ADD COLUMNS (reverted BOOLEAN)"),
    ),
    (
        12,
        "add-serial-index-to-active-deals",
        _sql(f"ALTER TABLE {TABLE} ADD COLUMNS (id BIGINT)"),
    ),
    (13, "index-active-deals-state", _noop_indexed_by_layout),
    (14, "index-active-deals-submittable", _noop_indexed_by_layout),
    (15, "index-active-deals-reverted", _noop_indexed_by_layout),
]


def applied_versions(spark: SparkSession) -> set[int]:
    if not spark.catalog.databaseExists(DB) or not spark.catalog.tableExists(VERSIONS_TABLE):
        return set()
    return {r[0] for r in spark.table(VERSIONS_TABLE).select("version").collect()}


def apply_migrations(spark: SparkSession) -> list[int]:
    """Apply all pending migrations in order; returns the versions applied.

    Idempotent: re-running applies nothing (the Postgrator contract). The
    version ledger is written AFTER each migration commits, so a crash
    mid-sequence resumes at the failed version."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {DB}")
    spark.sql(
        f"CREATE TABLE IF NOT EXISTS {VERSIONS_TABLE} "
        "(version INT, name STRING, applied_at TIMESTAMP_NTZ) USING PARQUET"
    )
    done = applied_versions(spark)
    applied = []
    for version, name, fn in MIGRATIONS:
        if version in done:
            continue
        fn(spark)
        spark.sql(
            f"INSERT INTO {VERSIONS_TABLE} "
            f"SELECT {version}, '{name}', current_timestamp()"
        )
        applied.append(version)
    return applied


def drop_all(spark: SparkSession) -> None:
    """Tear down the catalog objects (test helper).

    Functions are dropped one by one first: DROP DATABASE CASCADE removes
    them from the metastore but leaves stale entries in the session's
    function registry, which then poison the next DROP/CREATE FUNCTION."""
    if spark.catalog.databaseExists(DB):
        for fn in ("epoch_to_timestamp", "timestamp_to_epoch"):
            try:
                spark.sql(f"DROP FUNCTION IF EXISTS {DB}.{fn}")
            except Exception:  # noqa: BLE001 — already-stale entry
                pass
    spark.sql(f"DROP DATABASE IF EXISTS {DB} CASCADE")
