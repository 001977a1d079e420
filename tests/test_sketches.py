"""Sketch accuracy: HLL++ distinct estimates stay inside their configured
relative error against the exact counts (the check the DuckDB value-hash
oracle cannot express)."""

from __future__ import annotations

from conftest import SF_ORACLE

from pyspark.sql import functions as F

from spark_deal_observer_spark.plans.registry import REGISTRY
from spark_deal_observer_spark.sources.tables import load_table


def test_hll_within_tolerance(spark):
    # r7: the query now emits (exact_users, within_bound) — the sketch's
    # 5×rsd envelope check is value-gated in the query itself (the
    # tolerance-oracle form); this pins the in-query audit fired TRUE and
    # the exact side really is the exact count.
    rows = {
        r["event_type"]: r
        for r in REGISTRY["approx_distinct_users"].fn(spark, SF_ORACLE).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in load_table(spark, SF_ORACLE, "events")
        .groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    assert set(rows) == set(exact)
    for etype, n in exact.items():
        assert rows[etype]["exact_users"] == n
        assert rows[etype]["within_bound"] is True


def test_quantile_sketch_within_tolerance(spark):
    # r7 tolerance-oracle form: q50/q90/q99 are the EXACT interpolated
    # percentiles (rounded 6dp) and the GK sketch's [p±0.005] envelope
    # check rides in the *_in_bound booleans.
    rows = {
        r["event_type"]: r
        for r in REGISTRY["approx_quantiles_by_type"].fn(spark, SF_ORACLE).collect()
    }
    ev = load_table(spark, SF_ORACLE, "events")
    exact = {
        r["event_type"]: r["qs"]
        for r in ev.groupBy("event_type")
        .agg(F.expr("percentile(value, array(0.5D, 0.9D, 0.99D))").alias("qs"))
        .collect()
    }
    assert set(rows) == set(exact)
    for etype, qs in exact.items():
        r = rows[etype]
        assert (r["q50"], r["q90"], r["q99"]) == tuple(round(q, 6) for q in qs)
        assert r["q50_in_bound"] and r["q90_in_bound"] and r["q99_in_bound"]


def test_kmeans_partition_invariance(spark):
    """The distributed trainer must be a pure function of the DATA: cluster
    sizes and centroids identical no matter how the input is partitioned
    (the inter-round ROUND pins summation-order drift)."""
    from conftest import SF_SMALL

    from spark_deal_observer_spark.operators.similarity import kmeans_cells
    from spark_deal_observer_spark.sources.tables import load_table

    emb = load_table(spark, SF_SMALL, "embeddings")
    a = {r["cell"]: (r["n_members"], tuple(r["centroid"])) for r in kmeans_cells(emb).collect()}
    b = {
        r["cell"]: (r["n_members"], tuple(r["centroid"]))
        for r in kmeans_cells(emb.repartition(7)).collect()
    }
    assert a == b
    assert sum(n for n, _ in a.values()) == emb.count()


def test_handbuilt_hll_accuracy_and_merge_invariance(spark):
    """The hand-built HLL's reported rel_err must sit inside the standard
    1.04/sqrt(1024) ≈ 3.3% bound with headroom (5σ-ish), and the estimate
    must be partition-invariant: max-per-register is the merge, so any
    repartitioning of the input yields the identical registers."""
    rows = REGISTRY["hll_distinct_audit"].fn(spark, SF_ORACLE).collect()
    assert rows
    for r in rows:
        assert r["rel_err"] <= 0.17, (r["event_type"], r["rel_err"])
    from spark_deal_observer_spark.operators.sketches import hll_distinct_audit

    ev = load_table(spark, SF_ORACLE, "events")
    a = {r["event_type"]: r["hll_est"] for r in hll_distinct_audit(ev).collect()}
    b = {
        r["event_type"]: r["hll_est"]
        for r in hll_distinct_audit(ev.repartition(17, "user_id")).collect()
    }
    assert a == b


def test_histogram_quantile_accuracy_and_merge_invariance(spark):
    """The 256-bin histogram estimate must land within one bin width of
    the exact interpolated percentile (its theoretical bound), and the
    histogram must be partition-invariant (sum-per-bin is the merge)."""
    rows = REGISTRY["histogram_quantile_audit"].fn(spark, SF_ORACLE).collect()
    assert rows
    ev = load_table(spark, SF_ORACLE, "events")
    spans = {
        r["event_type"]: (r["hi"] - r["lo"]) / 256
        for r in ev.groupBy("event_type")
        .agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
        .collect()
    }
    for r in rows:
        assert r["abs_err"] <= spans[r["event_type"]] + 1e-9, (
            r["event_type"], r["metric"], r["abs_err"], spans[r["event_type"]],
        )
    from spark_deal_observer_spark.operators.sketches import histogram_quantile_audit

    a = {(r["event_type"], r["metric"]): r["hist_est"]
         for r in histogram_quantile_audit(ev).collect()}
    b = {(r["event_type"], r["metric"]): r["hist_est"]
         for r in histogram_quantile_audit(ev.repartition(13, "user_id")).collect()}
    assert a == b


def test_hll_set_ops_inclusion_exclusion_consistency(spark):
    """Pair union estimates must be consistent with the single-type
    estimates: max(|A|,|B|) ≤ |A∪B|_est (register-merge dominance, exact
    by construction since merged registers dominate each side's), and the
    reported union rel_err stays inside the HLL tolerance."""
    singles = {
        r["event_type"]: r["hll_est"]
        for r in REGISTRY["hll_distinct_audit"].fn(spark, SF_ORACLE).collect()
    }
    rows = REGISTRY["hll_set_ops_audit"].fn(spark, SF_ORACLE).collect()
    assert rows
    for r in rows:
        a, b = r["pair"].split("|")
        assert r["union_est"] >= max(singles[a], singles[b]) - 1e-6, r
        assert r["rel_err"] <= 0.17, r


def test_histogram_quantile_degenerate_group(spark):
    """All-equal values in a group: hi == lo must not divide by zero, and
    every quantile estimate must equal the constant exactly."""
    from spark_deal_observer_spark.operators.sketches import histogram_quantile_audit

    ev = spark.createDataFrame(
        [(i, "const", 7.5) for i in range(20)]
        + [(100 + i, "spread", float(i)) for i in range(20)],
        "event_id BIGINT, event_type STRING, value DOUBLE",
    )
    rows = {(r["event_type"], r["metric"]): r for r in histogram_quantile_audit(ev).collect()}
    for m in ("q50", "q90", "q99"):
        r = rows[("const", m)]
        assert r["hist_est"] == 7.5 and r["exact"] == 7.5 and r["abs_err"] == 0.0, r
    # sparse data: the exact percentile interpolates at rank (n-1)q+1 while
    # the histogram reads off rank q*n, so the error bound is one bin width
    # PLUS one adjacent-value gap (here gap=1.0 dominates); the dense-data
    # one-bin-width bound is asserted by the events-table accuracy test
    assert rows[("spread", "q50")]["abs_err"] <= 1.0 + 19.0 / 256 + 1e-9


def test_histogram_merge_within_bin_width(spark):
    """Merged-histogram union medians must sit within one (global) bin
    width of the exact interpolated median — the histogram error bound,
    now proven for the MERGED form (counter addition over shared bins),
    not just the per-type sketch."""
    from conftest import SF_ORACLE

    from spark_deal_observer_spark.plans.registry import REGISTRY

    rows = REGISTRY["histogram_merge_audit"].fn(spark, SF_ORACLE).collect()
    assert len(rows) == 10  # C(5 types, 2)
    lo, hi = (
        spark.read.parquet(f"{SF_ORACLE}/events.parquet")
        .selectExpr("min(value)", "max(value)")
        .collect()[0]
    )
    bin_width = (hi - lo) / 256
    for r in rows:
        assert r["n_merged"] > 0
        assert r["abs_err"] <= bin_width + 1e-9, (r, bin_width)
