"""Connected-components semantics on hand-built graphs (chain forces
multi-round label propagation; separate components stay separate), plus
the pointer-doubling round bound (VERDICT r6 #3): total Spark rounds
must stay ≤ ⌈log2(diameter)⌉+2 across 3 decades of chain diameter — the
shape that made the old single-jump loop O(diameter) and left a partial
clustering behind a warning at 100× graph diameter."""

from __future__ import annotations

import math

import pytest

from spark_deal_observer_spark.operators.dedup import (
    LAST_CC_STATS,
    _cc_run,
    connected_components,
)


def test_chain_triangle_and_pair(spark):
    # chain 1-2-3-4-5 (diameter 4), triangle 10-11-12, pair 20-21
    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (11, 12), (10, 12), (20, 21)]
    pairs = spark.createDataFrame(edges, "doc_a LONG, doc_b LONG")
    got = {r["doc_id"]: r["cluster"] for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1,
                   10: 10, 11: 10, 12: 10,
                   20: 20, 21: 20}


# -- pointer-doubling round bound (VERDICT r6 item 3) ------------------------
#
# Worst case for min-label propagation: a path graph with the minimum id at
# one END (ids ascending along the chain), so the min must cross the full
# diameter. The old loop (one fused jump per neighbor-min) needed
# O(diameter) rounds here and max_iter=25 silently truncated components
# wider than ~2^25 hops only behind a warning; with flatten-to-fixpoint
# pointer doubling the total Spark label-update rounds (neighbor-min +
# every flatten jump, INCLUDING the no-op verification rounds) are bounded
# by ceil(log2(diameter)) + 2 — the bound holds with equality on exact
# power-of-two diameters, so these pins are tight, not loose.


@pytest.mark.parametrize("n", [9, 65, 513])
def test_cc_pointer_doubling_round_bound(spark, n):
    diameter = n - 1
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(1, n)], "doc_a LONG, doc_b LONG"
    )
    got = {r.doc_id: r.cluster for r in _cc_run(chain, max_iter=25).collect()}
    assert got == {v: 1 for v in range(1, n + 1)}
    assert LAST_CC_STATS["converged"] is True
    bound = math.ceil(math.log2(diameter)) + 2
    assert LAST_CC_STATS["rounds"] <= bound, (
        f"chain d={diameter}: {LAST_CC_STATS['rounds']} rounds > {bound}"
    )


def test_cc_round_bound_min_in_middle(spark):
    # Min id in the MIDDLE of the chain halves the effective distance but
    # must not break the bound; also proves label values never escape the
    # component (two chains sharing no edge).
    n = 129
    edges = [(i, i + 1) for i in range(1000, 1000 + n - 1)]
    edges[n // 2] = (1, 1000 + n // 2 + 1)  # splice the min mid-chain
    edges.append((1, 1000 + n // 2))
    chain = spark.createDataFrame(edges, "doc_a LONG, doc_b LONG")
    got = {r.doc_id: r.cluster for r in _cc_run(chain, max_iter=25).collect()}
    assert set(got.values()) == {1}
    assert LAST_CC_STATS["converged"] is True
    # +3, not +2: the interior local min needs one extra hooking round by
    # construction (round 1 forms the two half-chain stars, round 2 hooks
    # them across the splice; a plain chain skips the second phase). The
    # pre-hooking loop needed O(n) rounds here and OOM'd the planner.
    assert LAST_CC_STATS["rounds"] <= math.ceil(math.log2(n - 1)) + 3


def test_cc_star_converges_in_constant_rounds(spark):
    # A star (dedup's common near-clique limit) must not pay the chain
    # bound: hub + 200 leaves converges in a handful of rounds.
    star = spark.createDataFrame(
        [(1, i) for i in range(2, 202)], "doc_a LONG, doc_b LONG"
    )
    got = {r.doc_id: r.cluster for r in _cc_run(star, max_iter=25).collect()}
    assert set(got.values()) == {1} and len(got) == 201
    assert LAST_CC_STATS["converged"] is True
    assert LAST_CC_STATS["rounds"] <= 4


def test_cc_star_of_stars_hooking(spark):
    # Adversarial for hooking: a hub star whose root is the MAX (leaves
    # 1..99 are all local minima, so no leaf merges in round 1 — only the
    # hub adopts). Converges in a handful of rounds, not O(leaves).
    edges = [(1000, i) for i in range(1, 100)]
    g = spark.createDataFrame(edges, "doc_a LONG, doc_b LONG")
    got = {r.doc_id: r.cluster for r in _cc_run(g, max_iter=25).collect()}
    assert set(got.values()) == {1} and len(got) == 100
    assert LAST_CC_STATS["converged"] is True
    assert LAST_CC_STATS["rounds"] <= 6
