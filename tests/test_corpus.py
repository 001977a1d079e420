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


def test_bloom_decontaminate_no_false_negatives(spark):
    """Bloom cleaning may over-remove (bounded FP rate) but must NEVER keep a
    doc that genuinely shares a token trigram with the probe set."""
    from spark_deal_observer_spark.functions.hashing import (
        hashed_token_ngrams_sql,
        tokens_sql,
    )
    from spark_deal_observer_spark.operators.corpus import (
        N_PROBE_DOCS,
        decontaminate_bloom,
    )

    docs = load_table(spark, SF_SMALL, "documents")
    clean = {r.doc_id for r in decontaminate_bloom(docs).collect()}
    assert clean  # the testdata must exercise a non-trivial clean set

    # exact token-trigram contamination via the join form
    grams = docs.select(
        "doc_id", F.expr(tokens_sql("spark", "text")).alias("tk")
    ).select("doc_id", F.explode(F.expr(hashed_token_ngrams_sql("spark", "tk"))).alias("h"))
    probe_hashes = grams.where(F.col("doc_id") < N_PROBE_DOCS).select("h").distinct()
    contaminated = {
        r.doc_id
        for r in grams.where(F.col("doc_id") >= N_PROBE_DOCS)
        .join(probe_hashes, "h")
        .select("doc_id")
        .distinct()
        .collect()
    }
    assert not (clean & contaminated)
    # and the over-removal is small: FP-flagged docs ≤ 2% of the true-clean set
    n_docs = docs.count()
    true_clean = n_docs - N_PROBE_DOCS - len(contaminated)
    assert true_clean - len(clean) <= max(2, 0.02 * true_clean)


def test_published_build_results_are_publish_once_and_value_stable(spark):
    """r9: exact_quantiles / budget_admission / dsir_model moved their
    plan-build driver jobs behind models.published. Pin (a) build runs
    ONCE per registry generation (a second call must not recompute), and
    (b) a cleared-registry rebuild returns identical values — the publish
    is a memo, never a value change."""
    from spark_deal_observer_spark.operators import corpus as cp
    from spark_deal_observer_spark.operators import models
    from spark_deal_observer_spark.operators import profile as pf

    docs = load_table(spark, SF_SMALL, "documents")
    li = load_table(spark, SF_SMALL, "lineitem")

    models.clear()
    calls = {"n": 0}
    real = pf._exact_quantiles_compute

    def counting(*a, **k):
        calls["n"] += 1
        return real(*a, **k)

    pf._exact_quantiles_compute, orig = counting, real
    try:
        q1 = pf.exact_quantiles(li, "l_extendedprice", [0.05, 0.95])
        q2 = pf.exact_quantiles(li, "l_extendedprice", [0.05, 0.95])
        assert calls["n"] == 1  # second call served from the registry
        assert q1 == q2
        models.clear()
        q3 = pf.exact_quantiles(li, "l_extendedprice", [0.05, 0.95])
        assert calls["n"] == 2  # cleared registry recomputes (bench cold path)
        assert q3 == q1  # ... to identical values
    finally:
        pf._exact_quantiles_compute = orig

    models.clear()
    adm1 = {r.doc_id: (r.cum_tokens, r.admitted)
            for r in cp.budget_admission(docs).collect()}
    adm2 = {r.doc_id: (r.cum_tokens, r.admitted)
            for r in cp.budget_admission(docs).collect()}  # registry hit
    models.clear()
    adm3 = {r.doc_id: (r.cum_tokens, r.admitted)
            for r in cp.budget_admission(docs).collect()}  # rebuilt
    assert adm1 == adm2 == adm3

    models.clear()
    d1, def1 = cp.dsir_model(docs)
    d2, def2 = cp.dsir_model(docs)
    assert d1 is d2 and def1 == def2  # same published objects on a hit
    rows1 = {r.bucket: r.delta for r in d1.collect()}
    models.clear()
    d3, def3 = cp.dsir_model(docs)
    assert def3 == def1
    assert {r.bucket: r.delta for r in d3.collect()} == rows1
