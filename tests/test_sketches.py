"""Sketch accuracy: HLL++ distinct estimates stay inside their configured
relative error against the exact counts (the check the DuckDB value-hash
oracle cannot express)."""

from __future__ import annotations

from conftest import SF_ORACLE

from pyspark.sql import functions as F

from spark_deal_observer_spark.plans.registry import REGISTRY
from spark_deal_observer_spark.sources.tables import load_table


def test_hll_within_tolerance(spark):
    approx = {
        r["event_type"]: r["approx_users"]
        for r in REGISTRY["approx_distinct_users"].fn(spark, SF_ORACLE).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in load_table(spark, SF_ORACLE, "events")
        .groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for etype, n in exact.items():
        # rsd=0.02 → allow 5 sigma-ish headroom
        assert abs(approx[etype] - n) <= max(2, 0.1 * n), (etype, approx[etype], n)


def test_quantile_sketch_within_tolerance(spark):
    approx = {
        r["event_type"]: (r["q50"], r["q90"], r["q99"])
        for r in REGISTRY["approx_quantiles_by_type"].fn(spark, SF_ORACLE).collect()
    }
    ev = load_table(spark, SF_ORACLE, "events")
    exact = {
        r["event_type"]: r["qs"]
        for r in ev.groupBy("event_type")
        .agg(F.expr("percentile(value, array(0.5, 0.9, 0.99))").alias("qs"))
        .collect()
    }
    assert set(approx) == set(exact)
    for etype in exact:
        for a, e in zip(approx[etype], exact[etype]):
            # GK with accuracy 10k: rank error <= n/10k; values are ~uniform
            # so a generous relative band suffices
            assert abs(a - e) <= max(0.5, 0.05 * abs(e)), (etype, a, e)


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
