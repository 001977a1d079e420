"""Versioned catalog DDL (S12): the full migration ladder applies cleanly,
re-running is a no-op, and the resulting table has the reference's final
schema (db/migrations/001..015) in Spark types."""

from __future__ import annotations

import pytest

from spark_deal_observer_spark.sources import ddl


@pytest.fixture()
def clean_catalog(spark):
    ddl.drop_all(spark)
    yield spark
    ddl.drop_all(spark)


def test_migrations_apply_and_rerun_is_noop(clean_catalog):
    spark = clean_catalog
    applied = ddl.apply_migrations(spark)
    assert applied == [v for v, _, _ in ddl.MIGRATIONS]
    assert ddl.apply_migrations(spark) == []  # idempotent re-run
    assert ddl.applied_versions(spark) == {v for v, _, _ in ddl.MIGRATIONS}


def test_final_schema_matches_reference(clean_catalog):
    spark = clean_catalog
    ddl.apply_migrations(spark)
    fields = {f.name: f.dataType.simpleString() for f in spark.table(ddl.TABLE).schema}
    assert fields == {
        "activated_at_epoch": "int",
        "miner_id": "int",
        "client_id": "int",
        "piece_cid": "string",
        "piece_size": "bigint",
        "term_start_epoch": "int",
        "term_min": "int",
        "term_max": "int",
        "sector_id": "bigint",  # migration 003 retyped INT -> BIGINT
        "payload_cid": "string",
        "submitted_at": "timestamp_ntz",  # 004
        "payload_retrievability_state": "string",  # 009
        "last_payload_retrieval_attempt": "timestamp_ntz",  # 009
        "reverted": "boolean",  # 011
        "id": "bigint",  # 012
    }


def test_table_is_bucketed_on_lookup_key(clean_catalog):
    spark = clean_catalog
    ddl.apply_migrations(spark)
    detail = spark.sql(f"DESCRIBE TABLE EXTENDED {ddl.TABLE}").collect()
    info = {r.col_name: r.data_type for r in detail}
    assert info.get("Num Buckets") == str(ddl.N_BUCKETS)
    assert "miner_id" in info.get("Bucket Columns", "")


def test_sql_epoch_functions_match_python(clean_catalog):
    spark = clean_catalog
    ddl.apply_migrations(spark)
    row = spark.sql(
        f"SELECT {ddl.DB}.epoch_to_timestamp(4623000) AS ts, "
        f"{ddl.DB}.timestamp_to_epoch(TIMESTAMP_NTZ '2025-01-18 03:00:00') AS ep"
    ).collect()[0]
    from spark_deal_observer_spark.plans.deals import REF_UNIX
    from spark_deal_observer_spark.functions.epoch import EPOCH_SECONDS, GENESIS_UNIX

    assert row.ep == (REF_UNIX - GENESIS_UNIX) // EPOCH_SECONDS
    expected_unix = 4623000 * EPOCH_SECONDS + GENESIS_UNIX
    assert int(row.ts.timestamp()) == expected_unix


def test_insert_roundtrip(clean_catalog):
    spark = clean_catalog
    ddl.apply_migrations(spark)
    spark.sql(
        f"""INSERT INTO {ddl.TABLE} VALUES
        (4623000, 1, 2, 'baga1', 100, 4623100, 5000, 10000, CAST(7 AS BIGINT),
         'bafy1', NULL, 'PAYLOAD_CID_NOT_QUERIED_YET', NULL, false, 1)"""
    )
    assert spark.table(ddl.TABLE).count() == 1
