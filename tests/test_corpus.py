"""Invariant tests for the corpus-preparation operators, beyond the oracle
value checks: determinism, partition-invariance, and packing geometry."""

from __future__ import annotations

from conftest import SF_SMALL
from pyspark.sql import functions as F

from spark_deal_observer_spark.operators.corpus import (
    DEFAULT_CAPACITY,
    pack_manifest,
    train_val_split,
)
from spark_deal_observer_spark.sources.tables import load_table


def test_split_is_deterministic_and_partition_invariant(spark):
    docs = load_table(spark, SF_SMALL, "documents")
    a = {r.doc_id: r.split for r in train_val_split(docs).collect()}
    b = {r.doc_id: r.split for r in train_val_split(docs.repartition(13)).collect()}
    assert a == b  # hash of the key: layout can never move a doc across splits

    n = len(a)
    val = sum(1 for s in a.values() if s == "val")
    assert 0.01 <= val / n <= 0.15  # ~5% with small-sample slack


def test_pack_manifest_geometry(spark):
    docs = load_table(spark, SF_SMALL, "documents")
    rows = pack_manifest(docs).orderBy("source", "doc_id").collect()
    assert rows
    by_source: dict[str, list] = {}
    for r in rows:
        by_source.setdefault(r.source, []).append(r)
    for source_rows in by_source.values():
        # first doc of every source starts pack 0 at offset 0
        assert source_rows[0].pack_id == 0 and source_rows[0].pack_offset == 0
        cum = 0
        prev_pack = 0
        for r in source_rows:
            # manifest is exactly the concat-and-chunk arithmetic
            assert r.pack_id == cum // DEFAULT_CAPACITY
            assert r.pack_offset == cum % DEFAULT_CAPACITY
            assert r.pack_id >= prev_pack  # packs never go backwards
            prev_pack = r.pack_id
            cum += r.n_tokens


def test_pack_offsets_bounded(spark):
    docs = load_table(spark, SF_SMALL, "documents")
    out = pack_manifest(docs)
    assert out.where(
        (F.col("pack_offset") < 0) | (F.col("pack_offset") >= DEFAULT_CAPACITY)
    ).count() == 0
