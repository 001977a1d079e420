"""Connected-components semantics on hand-built graphs (chain forces
multi-round label propagation; separate components stay separate)."""

from __future__ import annotations

from spark_deal_observer_spark.operators.dedup import connected_components


def test_chain_triangle_and_pair(spark):
    # chain 1-2-3-4-5 (diameter 4), triangle 10-11-12, pair 20-21
    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (11, 12), (10, 12), (20, 21)]
    pairs = spark.createDataFrame(edges, "doc_a LONG, doc_b LONG")
    got = {r["doc_id"]: r["cluster"] for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1,
                   10: 10, 11: 10, 12: 10,
                   20: 20, 21: 20}
