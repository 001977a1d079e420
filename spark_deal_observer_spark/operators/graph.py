"""Graph operators beyond connected components: fixed-iteration PageRank.

Connected components (operators/dedup.py) is the clustering workhorse;
PageRank is the canonical "general iterative dataflow" the engine must also
express — rank propagation over an edge list with per-round joins and
aggregates, the same declarative-plan-per-round discipline as the k-means
trainer (similarity.py): fixed iteration count, ROUNDed state between
rounds so both engines walk identical doubles, corpus scalars as one-row
broadcast joins, never a driver-side collect inside the operator.

Per round: one join of the edge list with the rank vector (shuffle on src),
one aggregate onto dst (map-side combinable), one broadcast-left-join back
onto the node set. Rank-vector size is O(nodes) — at 100 TB the edge list
dominates and each round is edge-partitioned work, exactly how the
dedicated graph engines (Pregel and descendants) shard it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.rounding import round6_sql

DAMPING = 0.85
N_ITER = 2
ROUND_DP = 9  # inter-round rounding: pins summation-order drift on both engines


def _edges(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Symmetric customer↔supplier edge list from the order history.

    Node ids are prefixed ('c'/'s') so the two key spaces can't collide;
    edges are distinct and emitted in both directions (undirected graph ⇒
    no dangling-mass correction needed)."""
    base = (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("cnode"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("snode"),
        )
        .distinct()
    )
    return base.select(F.col("cnode").alias("src"), F.col("snode").alias("dst")).union(
        base.select(F.col("snode").alias("src"), F.col("cnode").alias("dst"))
    )


def _graph_structure(orders: DataFrame, lineitem: DataFrame):
    """(degree-weighted edge list, node set), PUBLISHED per logical input.

    The graph build (fact join + distinct + degree attach) is a one-off
    index pass — 1.17 M edges at sf0.1, the dominant cost of a pagerank
    call. Like signatures/centroids/codebooks it goes through the session
    artifact registry: every iterative consumer on the same input reuses
    one snapshotted build. The out-degree is attached HERE because it is
    loop-invariant — the r3 shape re-joined edges⋈outdeg every round."""
    from .models import published

    edges = _edges(orders, lineitem)

    def build():
        e = edges.localCheckpoint()
        nodes = e.select(F.col("src").alias("node")).distinct().localCheckpoint()
        deg = e.groupBy("src").agg(F.count("*").cast("double").alias("deg"))
        return e.join(deg, "src").localCheckpoint(), nodes

    return published(edges, "pagerank_graph", (), build)


# Observability for the convergence early-exits: rounds the last build
# actually ran, keyed by operator name (the oracle twin stays
# fixed-iteration — this records how many of those rounds were live).
LAST_ROUNDS: dict[str, int] = {}


def pagerank(
    orders: DataFrame,
    lineitem: DataFrame,
    n_iter: int = N_ITER,
    damping: float = DAMPING,
) -> DataFrame:
    """(node, pagerank) after `n_iter` synchronous rounds from uniform init.

    The converged rank vector is a PUBLISHED artifact (operators/
    models.py), like the cluster map and the LPA labels: node-sized
    (row-bounded), deterministic, and consumed by several catalog
    queries (`pagerank_entities`, `graph_suite`) — each consumer reads
    one snapshotted build instead of re-running the per-round joins."""
    from .models import published

    wedges, nodes = _graph_structure(orders, lineitem)
    return published(
        wedges,
        "pagerank_ranks",
        (n_iter, damping),
        lambda: _pagerank_run(wedges, nodes, n_iter, damping),
    )


def _pagerank_run(
    wedges: DataFrame, nodes: DataFrame, n_iter: int, damping: float
) -> DataFrame:
    # The graph structures are static across rounds; localCheckpoint
    # snapshots them once — without it every round's plan re-derives the
    # edge list (orders⋈lineitem + distinct) for edges, nodes, AND outdeg,
    # multiplying the dominant join by 2+2·n_iter. Same lineage-truncation
    # discipline as connected_components.
    scal = nodes.agg(F.count("*").cast("double").alias("n"))
    pr = nodes.crossJoin(F.broadcast(scal)).select(
        "node", F.round(F.lit(1.0) / F.col("n"), ROUND_DP).alias("pr")
    )
    prev_chk = None
    rounds = 0
    for _ in range(n_iter):
        # The rank vector is NODE-sized (here: the customer+supplier
        # dimension) while the edge list is fact-sized — broadcast the
        # small side so the edge table never shuffles; each round is one
        # broadcast join + one map-side-combinable aggregate onto dst.
        # On a graph whose node set itself outgrows broadcast (web-scale
        # entity graphs) this reverts to the shuffle join — that switch is
        # the standard Pregel-vs-broadcast decision, made per graph.
        contrib = (
            wedges.join(F.broadcast(pr), wedges.src == pr.node)
            .groupBy("dst")
            .agg(F.sum(F.col("pr") / F.col("deg")).alias("mass"))
        )
        pr = (
            nodes.join(F.broadcast(contrib), nodes.node == contrib.dst, "left")
            .crossJoin(F.broadcast(scal))
            .select(
                "node",
                F.round(
                    (1 - damping) / F.col("n")
                    + damping * F.coalesce(F.col("mass"), F.lit(0.0)),
                    ROUND_DP,
                ).alias("pr"),
            )
            .localCheckpoint(eager=False)
        )
        rounds += 1
        # Convergence early-exit, exact vs the fixed-iteration oracle: the
        # update is a deterministic function of the rank table, so an
        # unchanged table is a fixed point and the remaining rounds are
        # no-ops. Rounding to ROUND_DP per round makes "unchanged" a real
        # bitwise fixpoint (no float drift). The checksum rides the lazy
        # checkpoint's materialization job (the CC trick).
        chk = pr.agg(
            F.sum(
                F.xxhash64("node", F.col("pr").cast("string")).cast(
                    "decimal(38,0)"
                )
            ).alias("chk")
        ).collect()[0][0]
        if chk == prev_chk:
            break
        prev_chk = chk
    LAST_ROUNDS["pagerank"] = rounds
    return pr.select("node", F.col("pr").alias("pagerank"))


def pagerank_oracle(n_iter: int = N_ITER, damping: float = DAMPING) -> str:
    parts = [
        """base AS (
            SELECT DISTINCT 'c' || CAST(o.o_custkey AS STRING) AS cnode,
                            's' || CAST(l.l_suppkey AS STRING) AS snode
            FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey)""",
        """edges AS (SELECT cnode AS src, snode AS dst FROM base
                     UNION ALL SELECT snode, cnode FROM base)""",
        "nodes AS (SELECT DISTINCT src AS node FROM edges)",
        "scal AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes)",
        "outdeg AS (SELECT src, CAST(count(*) AS DOUBLE) AS deg FROM edges GROUP BY src)",
        f"pr0 AS (SELECT node, ROUND(1.0 / scal.n, {ROUND_DP}) AS pr FROM nodes CROSS JOIN scal)",
    ]
    for i in range(n_iter):
        parts.append(
            f"""m{i} AS (SELECT e.dst, sum(p.pr / d.deg) AS mass
                 FROM edges e JOIN pr{i} p ON e.src = p.node
                 JOIN outdeg d ON e.src = d.src GROUP BY e.dst)"""
        )
        parts.append(
            f"""pr{i + 1} AS (SELECT nodes.node,
                 ROUND((1 - {damping}) / scal.n
                       + {damping} * COALESCE(m{i}.mass, 0.0), {ROUND_DP}) AS pr
                 FROM nodes LEFT JOIN m{i} ON nodes.node = m{i}.dst CROSS JOIN scal)"""
        )
    joined = ",\n        ".join(parts)
    return f"""
        WITH {joined}
        SELECT node, pr AS pagerank FROM pr{n_iter}
    """


# -- label propagation communities --------------------------------------------

LPA_ITER = 2


def label_propagation(
    orders: DataFrame, lineitem: DataFrame, n_iter: int = LPA_ITER
) -> DataFrame:
    """(node, community) after `n_iter` synchronous label-propagation
    rounds (Raghavan et al. 2007): every node starts as its own label and
    per round adopts the most frequent label among its neighbors AND
    itself (the self-vote damps the oscillation synchronous LPA exhibits
    on bipartite graphs — this customer↔supplier graph is exactly that),
    ties broken by the smallest label. Deterministic by construction:
    fixed rounds, exact counts, total tie order.

    Same iterative dataflow discipline as pagerank above: the published
    graph build is reused, the label vector is NODE-sized and broadcasts
    into the fact-sized edge join, and the per-node argmax is a
    struct-min AGGREGATE (cnt desc, label asc) — never a window.

    Two scale measures on top of the r4 shape: (1) the converged label
    table is a PUBLISHED artifact — every consumer (`graph_communities`,
    `graph_suite`) reads one node-sized snapshot instead of re-running
    the per-round edge joins; (2) rounds EARLY-EXIT when the label table
    is stable (checksum riding each round's checkpoint materialization,
    the CC trick) — exact vs the fixed-iteration oracle because the
    update is a deterministic function of the labels, so a stable table
    is a fixed point and the skipped rounds are no-ops. The oracle twin
    stays unrolled at `n_iter`; `LAST_ROUNDS['label_propagation']`
    records how many rounds were live."""
    from .models import published

    wedges, nodes = _graph_structure(orders, lineitem)
    return published(
        wedges,
        "lpa_labels",
        (n_iter,),
        lambda: _lpa_run(wedges, nodes, n_iter),
    )


def _lpa_round(wedges: DataFrame, labels: DataFrame) -> DataFrame:
    """One synchronous LPA vote round (the deterministic update the
    early-exit's fixed-point argument quantifies over)."""
    neighbor_votes = (
        wedges.join(F.broadcast(labels), wedges.src == labels.node)
        .select(F.col("dst").alias("vnode"), "label")
    )
    self_votes = labels.select(F.col("node").alias("vnode"), "label")
    votes = (
        neighbor_votes.unionByName(self_votes)
        .groupBy("vnode", "label")
        .agg(F.count("*").alias("cnt"))
    )
    return (
        votes.groupBy("vnode")
        .agg(
            F.min(
                F.struct((-F.col("cnt")).alias("nc"), F.col("label"))
            ).alias("m")
        )
        .select(F.col("vnode").alias("node"), F.col("m.label").alias("label"))
    )


def _lpa_run(wedges: DataFrame, nodes: DataFrame, n_iter: int) -> DataFrame:
    labels = nodes.select("node", F.col("node").alias("label"))
    prev_chk = None
    rounds = 0
    for _ in range(n_iter):
        labels = _lpa_round(wedges, labels).localCheckpoint(eager=False)
        rounds += 1
        chk = labels.agg(
            F.sum(F.xxhash64("node", "label").cast("decimal(38,0)")).alias("chk")
        ).collect()[0][0]
        if chk == prev_chk:
            break
        prev_chk = chk
    LAST_ROUNDS["label_propagation"] = rounds
    return labels.select("node", F.col("label").alias("community"))


def label_propagation_oracle(n_iter: int = LPA_ITER) -> str:
    parts = [
        """base AS (
            SELECT DISTINCT 'c' || CAST(o.o_custkey AS STRING) AS cnode,
                            's' || CAST(l.l_suppkey AS STRING) AS snode
            FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey)""",
        """edges AS (SELECT cnode AS src, snode AS dst FROM base
                     UNION ALL SELECT snode, cnode FROM base)""",
        "nodes AS (SELECT DISTINCT src AS node FROM edges)",
        "l0 AS (SELECT node, node AS label FROM nodes)",
    ]
    for i in range(n_iter):
        parts.append(
            f"""v{i} AS (
                SELECT vnode, label, count(*) AS cnt FROM (
                  SELECT e.dst AS vnode, p.label
                  FROM edges e JOIN l{i} p ON e.src = p.node
                  UNION ALL SELECT node AS vnode, label FROM l{i})
                GROUP BY vnode, label)"""
        )
        parts.append(
            f"""l{i + 1} AS (
                SELECT vnode AS node, label FROM (
                  SELECT vnode, label,
                         row_number() OVER (PARTITION BY vnode
                           ORDER BY cnt DESC, label) AS rn
                  FROM v{i}) WHERE rn = 1)"""
        )
    joined = ",\n        ".join(parts)
    return f"""
        WITH {joined}
        SELECT node, label AS community FROM l{n_iter}
    """


# -- market-basket co-occurrence (bipartite projection) ------------------------

BASKET_CAP = 20   # top-M suppliers kept per customer basket
COPURCHASE_TOP = 20


def copurchase_pairs(
    orders: DataFrame,
    lineitem: DataFrame,
    cap: int = BASKET_CAP,
    top_n: int = COPURCHASE_TOP,
) -> DataFrame:
    """(supp_a, supp_b, n_customers): the strongest supplier co-purchase
    pairs — frequent-itemset mining at k=2 over the customer→supplier
    bipartite graph's projection, the classic market-basket /
    related-items analysis.

    The scale hazard is the per-basket pair explosion (baskets here reach
    102 suppliers; power-law baskets at 100 TB are unbounded), so each
    basket is CAPPED to its top-`cap` suppliers by purchase intensity
    (lineitem count, suppkey tiebreak) BEFORE the pair join — the same
    bounded-block discipline as the dedup candidate stages; the cap is
    explicit capped-co-occurrence semantics, not an approximation of the
    uncapped count. Plan: one (cust, supp) aggregate, one per-customer
    window over ≤|basket| rows, an equi-self-join on the customer key
    (codegen'd, AQE-skew-splittable), and a map-side-combined pair count
    — pair volume is customers × C(cap,2), linear in customers.

    The `top_n`-row result is a PUBLISHED artifact (the r4 rule: publish
    row-bounded results with multiple consumers — `copurchase_pairs` and
    `graph_suite` both read it), so the fact join + pair count runs once
    per corpus snapshot per session."""
    from pyspark.sql.window import Window

    from .models import published

    cs = (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .groupBy(
            F.col("o_custkey").alias("cust"), F.col("l_suppkey").alias("supp")
        )
        .agg(F.count("*").alias("w"))
    )

    def build() -> DataFrame:
        rn = F.row_number().over(
            Window.partitionBy("cust").orderBy(F.col("w").desc(), F.col("supp"))
        )
        top = cs.select("cust", "supp", rn.alias("rn")).where(F.col("rn") <= cap)
        a = top.select("cust", F.col("supp").alias("supp_a"))
        b = top.select("cust", F.col("supp").alias("supp_b"))
        return (
            a.join(b, "cust")
            .where(F.col("supp_a") < F.col("supp_b"))
            .groupBy("supp_a", "supp_b")
            .agg(F.count("*").cast("bigint").alias("n_customers"))
            .orderBy(F.col("n_customers").desc(), "supp_a", "supp_b")
            .limit(top_n)
            .localCheckpoint(eager=True)
        )

    return published(cs, "copurchase_pairs", (cap, top_n), build)


def copurchase_pairs_oracle(
    cap: int = BASKET_CAP, top_n: int = COPURCHASE_TOP
) -> str:
    return f"""
        WITH cs AS (
            SELECT o.o_custkey AS cust, l.l_suppkey AS supp,
                   count(*) AS w
            FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
            GROUP BY o.o_custkey, l.l_suppkey),
        top AS (
            SELECT cust, supp FROM (
                SELECT cust, supp,
                       row_number() OVER (PARTITION BY cust
                                          ORDER BY w DESC, supp) AS rn
                FROM cs) WHERE rn <= {cap})
        SELECT a.supp AS supp_a, b.supp AS supp_b,
               CAST(count(*) AS BIGINT) AS n_customers
        FROM top a JOIN top b ON a.cust = b.cust AND a.supp < b.supp
        GROUP BY a.supp, b.supp
        ORDER BY n_customers DESC, supp_a, supp_b LIMIT {top_n}
    """


# -- triangle counting / clustering coefficient ------------------------------

TRI_BASKET_CAP = 30  # per-order part-basket bound before the pair join


def part_cooccur_edges(
    lineitem: DataFrame, cap: int = TRI_BASKET_CAP, w_min: int = 1
) -> DataFrame:
    """(u, v) with u < v: distinct part pairs that co-occur in an order —
    the unipartite projection of the order→part bipartite graph, the graph
    under the market-basket family with real sparse structure (the
    supplier projection is near-complete at every SF and degenerates
    triangle statistics to C(deg,2)).

    Same bounded-block discipline as `copurchase_pairs`: each order's
    basket is capped to its first `cap` parts (deterministic partkey
    order) BEFORE the self-join, so power-law baskets can't explode the
    pair stage — TPC-H baskets are ≤7 so the cap never binds here, but
    the plan carries the bound the 100 TB shape needs. Edge volume is
    Σ C(min(basket, cap), 2) — linear in orders. PUBLISHED per input:
    the edge list is the graph-build index pass every triangle/coefficient
    consumer reads (same rule as `_graph_structure`)."""
    from pyspark.sql.window import Window

    from .models import published

    b = lineitem.select(
        F.col("l_orderkey").alias("ord"), F.col("l_partkey").alias("p")
    ).distinct()

    def build() -> DataFrame:
        rn = F.row_number().over(Window.partitionBy("ord").orderBy("p"))
        capped = b.select("ord", "p", rn.alias("rn")).where(F.col("rn") <= cap)
        a = capped.select("ord", F.col("p").alias("u"))
        c = capped.select("ord", F.col("p").alias("v"))
        return (
            a.join(c, "ord")
            .where(F.col("u") < F.col("v"))
            .groupBy("u", "v")
            .agg(F.count("*").alias("w"))
            .where(F.col("w") >= w_min)
            .select("u", "v")
            .localCheckpoint(eager=True)
        )

    return published(b, "part_cooccur_edges", (cap, w_min), build)


def triangle_counts(lineitem: DataFrame, cap: int = TRI_BASKET_CAP) -> DataFrame:
    """(node, degree, triangles, clustering): per-node triangle count and
    local clustering coefficient over the part co-occurrence graph.

    Degree-ordered orientation (the MapReduce-era standard: Suri &
    Vassilvitskii 2011 / Cohen 2009): orient every edge from the
    lower-(degree, id) endpoint to the higher, enumerate wedges only at
    each edge's LOW-rank apex, and close them against the oriented edge
    list. Each triangle is generated exactly once (at its minimum-rank
    vertex), and — the scale property — per-node oriented out-degree is
    O(√m) on any graph, so the wedge stage is Σ C(outdeg, 2) ≤ O(m^1.5)
    TOTAL with no hot-vertex blowup: a star graph's hub emits ZERO wedges
    because every star edge orients INTO it. Both the wedge and the
    closing step are equi-joins (src; then (v, w) pair keys) — shuffles
    on bounded keys, never an all-pairs stage.

    The coefficient reads triangles against the SYMMETRIC simple-graph
    degree: clustering = 2·T / (deg·(deg−1)), 0.0 for degree-1 nodes.
    Node-sized result, PUBLISHED per (input, cap). Oracle: unoriented
    a<b<c three-way edge join (independent of the orientation argument —
    value parity proves each triangle counted once, none invented)."""
    from .models import published

    e = part_cooccur_edges(lineitem, cap)

    def build() -> DataFrame:
        deg = (
            e.select(F.col("u").alias("node"))
            .unionAll(e.select(F.col("v").alias("node")))
            .groupBy("node")
            .agg(F.count("*").alias("deg"))
            .localCheckpoint(eager=True)
        )
        ed = e.join(
            deg.select(F.col("node").alias("u"), F.col("deg").alias("du")), "u"
        ).join(
            deg.select(F.col("node").alias("v"), F.col("deg").alias("dv")), "v"
        )
        low = (F.col("du") < F.col("dv")) | (
            (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
        )
        o = ed.select(
            F.when(low, F.col("u")).otherwise(F.col("v")).alias("src"),
            F.when(low, F.col("v")).otherwise(F.col("u")).alias("dst"),
            F.when(low, F.col("dv")).otherwise(F.col("du")).alias("ddst"),
        ).localCheckpoint(eager=True)
        w1 = o.select("src", F.col("dst").alias("x"), F.col("ddst").alias("dx"))
        w2 = o.select("src", F.col("dst").alias("y"), F.col("ddst").alias("dy"))
        wedges = w1.join(w2, "src").where(
            (F.col("dx") < F.col("dy"))
            | ((F.col("dx") == F.col("dy")) & (F.col("x") < F.col("y")))
        )
        closing = o.select(F.col("src").alias("x"), F.col("dst").alias("y"))
        tri = wedges.join(closing, ["x", "y"]).select(
            F.col("src").alias("a"), F.col("x").alias("b"), F.col("y").alias("c")
        )
        tn = (
            tri.select(F.explode(F.array("a", "b", "c")).alias("node"))
            .groupBy("node")
            .agg(F.count("*").alias("t"))
        )
        coeff = F.when(
            F.col("deg") > 1,
            F.round(
                F.lit(2.0)
                * F.col("t")
                / (F.col("deg") * (F.col("deg") - F.lit(1.0))),
                6,
            ),
        ).otherwise(F.lit(0.0))
        return (
            deg.join(tn, "node", "left")
            .na.fill({"t": 0})
            .select(
                "node",
                F.col("deg").cast("bigint").alias("degree"),
                F.col("t").cast("bigint").alias("triangles"),
                coeff.alias("clustering"),
            )
            .localCheckpoint(eager=True)
        )

    return published(e, "triangle_counts", (cap,), build)


def triangle_counts_oracle(cap: int = TRI_BASKET_CAP) -> str:
    return f"""
        WITH b AS (SELECT DISTINCT l_orderkey AS ord, l_partkey AS p
                   FROM lineitem),
        capped AS (SELECT ord, p FROM (
            SELECT ord, p,
                   row_number() OVER (PARTITION BY ord ORDER BY p) AS rn
            FROM b) WHERE rn <= {cap}),
        e AS (SELECT DISTINCT a.p AS u, c.p AS v
              FROM capped a JOIN capped c ON a.ord = c.ord AND a.p < c.p),
        deg AS (SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
                    SELECT u AS node FROM e
                    UNION ALL SELECT v AS node FROM e)
                GROUP BY node),
        tri AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
                FROM e e1 JOIN e e2 ON e2.u = e1.v
                JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
        tn AS (SELECT node, CAST(count(*) AS BIGINT) AS t FROM (
                   SELECT a AS node FROM tri
                   UNION ALL SELECT b AS node FROM tri
                   UNION ALL SELECT c AS node FROM tri)
               GROUP BY node)
        SELECT d.node, d.deg AS degree,
               COALESCE(tn.t, 0) AS triangles,
               CASE WHEN d.deg > 1
                    THEN ROUND(2.0 * COALESCE(tn.t, 0)
                               / (d.deg * (d.deg - 1.0)), 6)
                    ELSE 0.0 END AS clustering
        FROM deg d LEFT JOIN tn ON tn.node = d.node
    """


# -- k-core decomposition (iterative peeling) ---------------------------------

KCORE_K = 3
KCORE_W_MIN = 2  # weighted edges: pairs co-purchased >= twice
KCORE_MAX_ITER = 16  # measured peel depth at sf0.01 is 10; oracle unrolls this


def kcore(
    lineitem: DataFrame,
    k: int = KCORE_K,
    cap: int = TRI_BASKET_CAP,
    w_min: int = KCORE_W_MIN,
    max_iter: int = KCORE_MAX_ITER,
) -> DataFrame:
    """(node, core_degree): the k-core of the weighted part co-occurrence
    graph (edges with ≥ `w_min` shared orders) — synchronous peeling:
    each round drops EVERY node whose degree over the surviving subgraph
    is < k, until a fixpoint. The classic density filter for graph-shaped
    curation (keep entities embedded in a mutually-dense neighborhood;
    Seidman 1983, Batagelj-Zaveršnik peeling).

    Spark shape: one symmetric-degree aggregate + two semi-joins per
    round over a `localCheckpoint`ed edge list (the CC/LPA iteration
    discipline); convergence detection is a surviving-NODE count compare
    riding the checkpoint's materialization job, so a converged round
    costs no extra action. Early-exit is exact against the
    fixed-iteration oracle by the usual fixpoint argument: once no node
    falls below k, every further peel round is a no-op, so the oracle's
    `max_iter`-round unroll equals the converged state (the measured peel
    depth at sf0.01 is 10 rounds; `max_iter` = 16 bounds both engines).
    At 100 TB each round is edge-partitioned degree counting — the same
    per-round cost envelope as one PageRank round, and peel depth on
    real co-occurrence graphs is tens, not thousands."""
    from .models import published

    e = part_cooccur_edges(lineitem, cap, w_min)

    def build() -> DataFrame:
        LAST_ROUNDS["kcore"] = 0
        edges = e.localCheckpoint()
        n_nodes = -1
        for _ in range(max_iter):
            deg = (
                edges.select(F.col("u").alias("node"))
                .unionAll(edges.select(F.col("v").alias("node")))
                .groupBy("node")
                .agg(F.count("*").alias("deg"))
            )
            keep = deg.where(F.col("deg") >= k).localCheckpoint(eager=True)
            n_now = keep.count()
            if n_now == n_nodes:
                break
            LAST_ROUNDS["kcore"] = LAST_ROUNDS.get("kcore", 0) + 1
            n_nodes = n_now
            edges = (
                edges.join(
                    keep.select(F.col("node").alias("u")), "u", "left_semi"
                )
                .join(keep.select(F.col("node").alias("v")), "v", "left_semi")
                .select("u", "v")
                .localCheckpoint(eager=True)
            )
        return (
            edges.select(F.col("u").alias("node"))
            .unionAll(edges.select(F.col("v").alias("node")))
            .groupBy("node")
            .agg(F.count("*").cast("bigint").alias("core_degree"))
            .where(F.col("core_degree") >= k)
            .localCheckpoint(eager=True)
        )

    return published(e, "kcore", (k, cap, w_min, max_iter), build)


def kcore_oracle(
    k: int = KCORE_K,
    cap: int = TRI_BASKET_CAP,
    w_min: int = KCORE_W_MIN,
    max_iter: int = KCORE_MAX_ITER,
) -> str:
    rounds = []
    prev = "e0"
    for i in range(1, max_iter + 1):
        rounds.append(
            f"""n{i} AS MATERIALIZED (
            SELECT node FROM (SELECT u AS node FROM {prev}
                              UNION ALL SELECT v AS node FROM {prev})
            GROUP BY node HAVING count(*) >= {k}),
        e{i} AS MATERIALIZED (
            SELECT e.u, e.v FROM {prev} e
            JOIN n{i} a ON a.node = e.u
            JOIN n{i} b ON b.node = e.v)"""
        )
        prev = f"e{i}"
    return f"""
        WITH b AS (SELECT DISTINCT l_orderkey AS ord, l_partkey AS p
                   FROM lineitem),
        capped AS (SELECT ord, p FROM (
            SELECT ord, p,
                   row_number() OVER (PARTITION BY ord ORDER BY p) AS rn
            FROM b) WHERE rn <= {cap}),
        e0 AS MATERIALIZED (
            SELECT a.p AS u, c.p AS v
            FROM capped a JOIN capped c ON a.ord = c.ord AND a.p < c.p
            GROUP BY a.p, c.p HAVING count(*) >= {w_min}),
        {','.join(rounds)}
        SELECT node, CAST(count(*) AS BIGINT) AS core_degree
        FROM (SELECT u AS node FROM {prev} UNION ALL SELECT v AS node FROM {prev})
        GROUP BY node HAVING count(*) >= {k}
    """


# -- link prediction (common-neighbour family) --------------------------------

LP_APEX_CAP = 32  # neighbours enumerated per wedge apex (bounded-block rule):
# wedge volume is nodes x C(cap,2); 64 measured 40M wedge rows / 10 s at
# sf0.1 vs 10M / ~3 s at 32 with the same top-k panel shape
LP_MIN_CN = 2  # pairs sharing fewer common neighbours are noise, not links
LP_TOPK = 5  # predicted links reported per left node


def link_prediction(
    lineitem: DataFrame,
    cap: int = TRI_BASKET_CAP,
    apex_cap: int = LP_APEX_CAP,
    min_cn: int = LP_MIN_CN,
    topk: int = LP_TOPK,
) -> DataFrame:
    """(u, w, cn, deg_u, deg_w, jaccard, pref_attach): the top predicted
    links per node over the part co-occurrence graph — non-adjacent pairs
    ranked by common-neighbour count, with the Jaccard and
    preferential-attachment scores of the classic link-prediction panel
    (Liben-Nowell & Kleinberg 2003). The "customers who bought X also
    bought Y" inference over graph structure rather than direct
    co-occurrence: a high-scoring non-edge is a co-purchase the data
    implies but hasn't seen. Reference analog: the observer's dimension
    lookups relate entities by direct keys only; this is the derived
    relation layer a recommendation consumer would build on it.

    Adamic-Adar / resource-allocation are deliberately omitted: both sum
    per-neighbour float quotients (1/log·deg, 1/deg) whose accumulation
    order the two engines need not share. The panel kept is
    integer-exact: cn and pref_attach are BIGINTs and jaccard is ONE
    division of exact integers — the seasonal-decompose determinism rule.

    Scale shape: wedges enumerate at each apex over a DETERMINISTIC
    apex_cap-bounded neighbour list (lowest-id order), so the wedge stage
    is Σ C(min(deg, apex_cap), 2) — linear in nodes with the cap as the
    hot-vertex bound (the degree-ordered-orientation trick is unavailable
    here: common neighbours need BOTH spokes of every wedge). The
    candidate set then anti-joins the edge list (equi, AQE-splittable)
    and joins degrees twice (node-sized). Output is top-k per node —
    row-bounded like `copurchase_pairs`."""
    from pyspark.sql.window import Window

    from .models import published

    edges = part_cooccur_edges(lineitem, cap)

    def build() -> DataFrame:
        sym = edges.select(F.col("u").alias("v"), F.col("v").alias("n")).union(
            edges.select(F.col("v").alias("v"), F.col("u").alias("n"))
        )
        deg = sym.groupBy("v").agg(F.count("*").cast("bigint").alias("deg"))
        rn = F.row_number().over(Window.partitionBy("v").orderBy("n"))
        # checkpoint the capped adjacency: the wedge self-join reads it
        # TWICE, and without the barrier each branch re-sorts the full
        # symmetric edge list for the row_number window
        capped = (
            sym.select("v", "n", rn.alias("rn"))
            .where(F.col("rn") <= apex_cap)
            .select("v", "n")
            .localCheckpoint(eager=True)
        )
        a = capped.select("v", F.col("n").alias("u"))
        b = capped.select("v", F.col("n").alias("w"))
        cand = (
            a.join(b, "v")
            .where(F.col("u") < F.col("w"))
            .groupBy("u", "w")
            .agg(F.count("*").cast("bigint").alias("cn"))
            .where(F.col("cn") >= min_cn)
        )
        non_edges = cand.join(
            edges, (cand.u == edges.u) & (cand.w == edges.v), "left_anti"
        )
        du = deg.select(F.col("v").alias("u"), F.col("deg").alias("deg_u"))
        dw = deg.select(F.col("v").alias("w"), F.col("deg").alias("deg_w"))
        scored = non_edges.join(du, "u").join(dw, "w")
        pick = F.row_number().over(
            Window.partitionBy("u").orderBy(F.col("cn").desc(), F.col("w"))
        )
        return (
            scored.select("u", "w", "cn", "deg_u", "deg_w", pick.alias("pick"))
            .where(F.col("pick") <= topk)
            .select(
                "u",
                "w",
                "cn",
                "deg_u",
                "deg_w",
                F.round(
                    F.col("cn") / (F.col("deg_u") + F.col("deg_w") - F.col("cn")), 6
                ).alias("jaccard"),
                (F.col("deg_u") * F.col("deg_w")).cast("bigint").alias("pref_attach"),
            )
            .localCheckpoint(eager=True)
        )

    # top-k per node is ROW-BOUNDED and read by two consumers (the
    # registered query and graph_suite) — published like copurchase_pairs
    return published(edges, "link_prediction", (cap, apex_cap, min_cn, topk), build)


def link_prediction_oracle(
    cap: int = TRI_BASKET_CAP,
    apex_cap: int = LP_APEX_CAP,
    min_cn: int = LP_MIN_CN,
    topk: int = LP_TOPK,
) -> str:
    return f"""
        WITH b AS (SELECT DISTINCT l_orderkey AS ord, l_partkey AS p
                   FROM lineitem),
        capped_b AS (SELECT ord, p FROM (
            SELECT ord, p,
                   row_number() OVER (PARTITION BY ord ORDER BY p) AS rn
            FROM b) WHERE rn <= {cap}),
        e AS MATERIALIZED (SELECT DISTINCT a.p AS u, c.p AS v
              FROM capped_b a JOIN capped_b c ON a.ord = c.ord AND a.p < c.p),
        sym AS MATERIALIZED (SELECT u AS v, v AS n FROM e
               UNION ALL SELECT v AS v, u AS n FROM e),
        deg AS (SELECT v, CAST(count(*) AS BIGINT) AS deg FROM sym GROUP BY v),
        capped AS MATERIALIZED (SELECT v, n FROM (
            SELECT v, n, row_number() OVER (PARTITION BY v ORDER BY n) AS rn
            FROM sym) WHERE rn <= {apex_cap}),
        cand AS (SELECT a.n AS u, c.n AS w, CAST(count(*) AS BIGINT) AS cn
                 FROM capped a JOIN capped c ON a.v = c.v AND a.n < c.n
                 GROUP BY a.n, c.n HAVING count(*) >= {min_cn}),
        non_edges AS (SELECT * FROM cand
                      WHERE NOT EXISTS (SELECT 1 FROM e
                                        WHERE e.u = cand.u AND e.v = cand.w)),
        scored AS (SELECT ne.u, ne.w, ne.cn, du.deg AS deg_u, dw.deg AS deg_w
                   FROM non_edges ne
                   JOIN deg du ON du.v = ne.u
                   JOIN deg dw ON dw.v = ne.w),
        picked AS (SELECT *, row_number() OVER (PARTITION BY u
                            ORDER BY cn DESC, w) AS pick FROM scored)
        SELECT u, w, cn, deg_u, deg_w,
               {round6_sql("cn / (deg_u + deg_w - cn)")} AS jaccard,
               CAST(deg_u * deg_w AS BIGINT) AS pref_attach
        FROM picked WHERE pick <= {topk}
    """


# -- single-source BFS levels --------------------------------------------------

BFS_MAX_DEPTH = 8  # oracle unroll bound; co-occurrence diameter measures ~4


def bfs_levels(
    lineitem: DataFrame, cap: int = TRI_BASKET_CAP, max_depth: int = BFS_MAX_DEPTH
) -> DataFrame:
    """(node, level): breadth-first distance from the graph's HUB (the
    max-degree node, min-id tiebreak) over the part co-occurrence graph,
    up to `max_depth` hops — the reachability / hop-distance primitive
    under every "related within k hops" product query, and the simplest
    member of the iterative-frontier family (CC and LPA propagate labels;
    BFS propagates a frontier).

    Frontier iteration with the house discipline: one equi-join per round
    (frontier ⋈ adjacency), anti-join against the visited set, lazy
    localCheckpoint per round with the count riding the materialization,
    EARLY EXIT on an empty frontier — exact vs the fixed-unroll oracle
    because an empty frontier is a fixed point (every later round is a
    no-op). Levels are exact BFS distances for any node within
    `max_depth`; deeper nodes are omitted by both engines (the bounded
    semantics the oracle's recursion cap needs — an UNBOUNDED recursive
    CTE on a cyclic graph would never terminate)."""
    from .models import published

    edges = part_cooccur_edges(lineitem, cap)
    return published(
        edges, "bfs_levels", (max_depth,), lambda: _bfs_run(edges, max_depth)
    )


def _bfs_run(edges: DataFrame, max_depth: int) -> DataFrame:
    sym = edges.union(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).localCheckpoint(eager=False)
    deg = sym.groupBy("u").agg(F.count("*").alias("d"))
    hub = (
        deg.orderBy(F.col("d").desc(), F.col("u")).limit(1).select("u")
    )
    visited = hub.select(
        F.col("u").alias("node"), F.lit(0).alias("level")
    ).localCheckpoint(eager=True)
    frontier = visited
    for depth in range(1, max_depth + 1):
        nxt = (
            frontier.join(sym, frontier.node == sym.u)
            .select(F.col("v").alias("node"))
            .distinct()
            .join(visited, "node", "left_anti")
            .select("node", F.lit(depth).alias("level"))
            .localCheckpoint(eager=False)
        )
        if nxt.isEmpty():
            break
        visited = visited.union(nxt).localCheckpoint(eager=False)
        frontier = nxt
    return visited.select(
        "node", F.col("level").cast("int").alias("level")
    ).localCheckpoint(eager=True)


def bfs_levels_oracle(
    cap: int = TRI_BASKET_CAP, max_depth: int = BFS_MAX_DEPTH
) -> str:
    return f"""
        WITH RECURSIVE b AS (SELECT DISTINCT l_orderkey AS ord, l_partkey AS p
                   FROM lineitem),
        capped AS (SELECT ord, p FROM (
            SELECT ord, p,
                   row_number() OVER (PARTITION BY ord ORDER BY p) AS rn
            FROM b) WHERE rn <= {cap}),
        e AS MATERIALIZED (SELECT DISTINCT a.p AS u, c.p AS v
              FROM capped a JOIN capped c ON a.ord = c.ord AND a.p < c.p),
        sym AS MATERIALIZED (SELECT u, v FROM e
               UNION ALL SELECT v AS u, u AS v FROM e),
        hub AS (SELECT u FROM (
            SELECT u, count(*) AS d FROM sym GROUP BY u
            ORDER BY d DESC, u LIMIT 1)),
        walk(node, lvl) AS (
          SELECT u, 0 FROM hub
          UNION
          SELECT s.v, w.lvl + 1 FROM walk w JOIN sym s ON s.u = w.node
          WHERE w.lvl < {max_depth}
        )
        SELECT node, CAST(min(lvl) AS INT) AS level FROM walk GROUP BY node
    """
