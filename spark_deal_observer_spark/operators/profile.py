"""Dataset profiling: per-column statistics over a table in one declarative
pass per column — the data-quality / layout-planning primitive every
large-scale pipeline runs before (and after) a transformation: null
fractions catch schema drift, distinct counts drive join-strategy and
bucketing decisions, min/max bounds feed partition pruning and z-order
range checks (`operators/layout.py`).

Output: one row per profiled column —
    (column, n_rows, n_nulls, n_distinct, min_num, max_num, min_str, max_str)
with the numeric bounds NULL for string columns and vice versa (a uniform
schema keeps the report one table).

Scale posture: each column is an independent two-phase aggregate (map-side
partial min/max/count, a single-row result) — no Expand blow-up from
multi-count-distinct in one aggregate, no corpus-wide shuffle on values
except the per-column distinct (which shuffles one column's values only,
with partial dedup map-side). At 100 TB the exact distinct is the one
stage you'd swap for an HLL sketch — that path exists as
`approx_distinct_users` (operators/skew.py); this operator keeps the exact
form so the DuckDB twin proves the rest of the report value-for-value.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (column, kind) — kind picks which bound pair the column fills.
PROFILE_COLS: tuple[tuple[str, str], ...] = (
    ("o_orderkey", "num"),
    ("o_custkey", "num"),
    ("o_totalprice", "num"),
    ("o_orderstatus", "str"),
    ("o_orderpriority", "str"),
)


def table_profile(orders: DataFrame) -> DataFrame:
    # r9 negative result (guide §1.3 stopwatch discipline, recorded in
    # OPTIMIZATION_r09.md): a one-scan form — all 5 columns' aggregates
    # side by side (count-DISTINCTs via one expand) + stack() — measured
    # 1.24 s warm vs this union form's ~0.85 s at sf0.1 even after
    # projecting + spreading the expand across cores: the 5× expand
    # multiply through one wide hash aggregate costs more than 5 small
    # parallel single-column jobs. Kept as the union of per-column
    # aggregates; at real cluster scale the trade-off may invert (5 I/O
    # passes vs 1), but that is a measurement to make there, not here.
    # (The branch expressions ride the r9 SQL-string rule — one parsed
    # call per aggregate instead of a Column-object chain each.)
    parts = []
    for col, kind in PROFILE_COLS:
        num = kind == "num"
        parts.append(
            orders.agg(
                F.expr(f"'{col}'").alias("column"),
                F.expr("count(*)").alias("n_rows"),
                F.expr(
                    f"CAST(sum(CASE WHEN {col} IS NULL THEN 1 ELSE 0 END) AS BIGINT)"
                ).alias("n_nulls"),
                F.expr(f"count(DISTINCT {col})").alias("n_distinct"),
                F.expr(
                    f"CAST(min({col}) AS DOUBLE)" if num else "CAST(NULL AS DOUBLE)"
                ).alias("min_num"),
                F.expr(
                    f"CAST(max({col}) AS DOUBLE)" if num else "CAST(NULL AS DOUBLE)"
                ).alias("max_num"),
                F.expr(
                    f"min({col})" if not num else "CAST(NULL AS STRING)"
                ).alias("min_str"),
                F.expr(
                    f"max({col})" if not num else "CAST(NULL AS STRING)"
                ).alias("max_str"),
            )
        )
    return reduce(DataFrame.unionAll, parts)


def table_profile_oracle() -> str:
    branches = []
    for col, kind in PROFILE_COLS:
        num = kind == "num"
        min_num = f"CAST(min({col}) AS DOUBLE)" if num else "CAST(NULL AS DOUBLE)"
        max_num = f"CAST(max({col}) AS DOUBLE)" if num else "CAST(NULL AS DOUBLE)"
        min_str = f"min({col})" if not num else "CAST(NULL AS VARCHAR)"
        max_str = f"max({col})" if not num else "CAST(NULL AS VARCHAR)"
        branches.append(
            f"""SELECT '{col}' AS column, count(*) AS n_rows,
                 CAST(sum(CASE WHEN {col} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
                 count(DISTINCT {col}) AS n_distinct,
                 {min_num} AS min_num, {max_num} AS max_num,
                 {min_str} AS min_str, {max_str} AS max_str
               FROM orders"""
        )
    return " UNION ALL ".join(branches)


# -- pairwise column correlations -------------------------------------------

CORR_COLS: tuple[str, ...] = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


def column_correlations(lineitem: DataFrame) -> DataFrame:
    """Pearson correlation for every pair of numeric lineitem columns:
    (col_a, col_b, corr) — the feature-selection / drift-detection
    companion to `table_profile`.

    ONE pass over the table: `corr` is a two-phase aggregate of co-moments
    (map-side partial sums of x, y, x², y², xy per pair), so all C·(C−1)/2
    pairs ride a single scan and the shuffle moves one co-moment row per
    task. Results ROUND to 6 dp (summation-order parity, as everywhere)."""
    pairs = [
        (a, b)
        for i, a in enumerate(CORR_COLS)
        for b in CORR_COLS[i + 1 :]
    ]
    agg = lineitem.agg(
        *[
            F.round(F.corr(a, b), 6).alias(f"c_{i}")
            for i, (a, b) in enumerate(pairs)
        ]
    )
    stack = ", ".join(
        f"'{a}', '{b}', c_{i}" for i, (a, b) in enumerate(pairs)
    )
    return agg.select(
        F.expr(
            f"stack({len(pairs)}, {stack}) AS (col_a, col_b, corr)"
        )
    )


def column_correlations_oracle() -> str:
    pairs = [
        (a, b)
        for i, a in enumerate(CORR_COLS)
        for b in CORR_COLS[i + 1 :]
    ]
    branches = [
        f"SELECT '{a}' AS col_a, '{b}' AS col_b, ROUND(corr({a}, {b}), 6) AS corr FROM lineitem"
        for a, b in pairs
    ]
    return " UNION ALL ".join(branches)


# -- distribution drift (PSI) -----------------------------------------------

PSI_BINS: tuple[int, ...] = (0, 10, 20, 30, 40, 50)  # token-count bin edges
PSI_SMOOTH = 0.0005  # zero-bin smoothing (standard PSI practice)


def _tok_bin(dialect: str) -> str:
    """Fixed-edge bin index of the document token count (shared edges — a
    drift statistic over learned/quantile edges would confound edge drift
    with distribution drift)."""
    from ..functions.hashing import tokens_sql

    toks = tokens_sql(dialect, "text")
    size_f = "size" if dialect == "spark" else "len"
    n = f"{size_f}({toks})"
    conds = "".join(
        f"WHEN {n} < {e} THEN {i} " for i, e in enumerate(PSI_BINS[1:])
    )
    return f"CASE {conds}ELSE {len(PSI_BINS) - 1} END"


def source_drift_psi(docs: DataFrame, baseline_source: str = "src0") -> DataFrame:
    """Population Stability Index of every source's token-count distribution
    against `baseline_source`: (source, psi) — the drift monitor a corpus
    pipeline runs per ingest snapshot (PSI > 0.2 conventionally flags a
    shifted feed: truncation bugs, boilerplate floods, crawler changes).

    psi = Σ_bins (p_b − q_b)·ln(p_b / q_b), both sides smoothed so empty
    bins stay finite. Scale shape: TWO exchanges total — one (source)
    aggregate whose conditional sums produce the DENSE per-source bin
    distribution directly (map-side combined; empty bins are zero rows of
    the sum, no grid join to densify), and the baseline's one-row
    distribution broadcast back; the per-source psi is a |bins|-element
    in-row fold. ROUND at the psi (6 dp) — the counts themselves are
    exact."""
    nb = len(PSI_BINS)
    b = F.expr(_tok_bin("spark"))
    binned = docs.select("source", b.alias("bin"))
    dist = binned.groupBy("source").agg(
        F.count("*").alias("tot"),
        *[
            F.sum(F.when(F.col("bin") == i, 1).otherwise(0)).alias(f"c{i}")
            for i in range(nb)
        ],
    ).select(
        "source",
        F.array(
            *[
                (F.col(f"c{i}") / F.col("tot") + PSI_SMOOTH)
                for i in range(nb)
            ]
        ).alias("p"),
    )
    # r10 (guide §2.4; the cms/DSIR exchange-reuse breaker recurring): the
    # baseline filter is on dist's GROUPING KEY, so Catalyst pushes it
    # below the aggregate — the baseline branch became its own full
    # binned-aggregate scan of the corpus and the two (source) exchanges
    # never reused. The documented barrier-COLUMN form (nondeterministic
    # projected column referenced by the filter; an inline conjunct gets
    # split and pushed anyway) holds the filter above the aggregate:
    # ONE binning pass feeds both sides (ReusedExchange pinned in
    # tests/test_plans.py). Values unchanged — the filter is on a group
    # key, above or below the aggregate.
    base = (
        dist.withColumn("_barrier", F.monotonically_increasing_id())
        .where(
            (F.col("source") == baseline_source) & (F.col("_barrier") >= 0)
        )
        .select(F.col("p").alias("q"))
    )
    fold = F.expr(
        "ROUND(aggregate(zip_with(p, q, (pv, qv) -> (pv - qv) * ln(pv / qv)), "
        "CAST(0 AS DOUBLE), (acc, v) -> acc + v), 6)"
    )
    return dist.crossJoin(F.broadcast(base)).select("source", fold.alias("psi"))


def source_drift_psi_oracle(baseline_source: str = "src0") -> str:
    b = _tok_bin("duckdb")
    nb = len(PSI_BINS)
    comps = ", ".join(
        f"(CAST(sum(CASE WHEN bin = {i} THEN 1 ELSE 0 END) AS DOUBLE)"
        f" / count(*) + {PSI_SMOOTH})"
        for i in range(nb)
    )
    return f"""
        WITH binned AS (SELECT source, {b} AS bin FROM documents),
        dist AS (SELECT source, [{comps}] AS p FROM binned GROUP BY source),
        base AS (SELECT p AS q FROM dist WHERE source = '{baseline_source}')
        SELECT d.source,
               ROUND(list_sum(list_transform(generate_series(1, {nb}),
                     j -> (d.p[j] - b.q[j]) * ln(d.p[j] / b.q[j]))), 6) AS psi
        FROM dist d CROSS JOIN base b
    """


# -- distributed exact quantiles (sketch-bracket + exact-refine) ------------


def exact_quantiles(df: DataFrame, col: str, ps: list[float]) -> list[float]:
    """Published wrapper over `_exact_quantiles_compute`: the quantile
    list is a ROW-BOUNDED derived result (|ps| floats) whose computation
    costs two full scan passes — exactly the artifact-registry class
    (r4 rule: publish row-bounded results / shared dominant compute).
    Before this, every plan BUILD of a consumer (winsorized_stats,
    profile_suite) re-ran both scans as driver-blocking jobs; now the
    first build per (input plan, col, ps) computes and later builds fold
    the published literals. Values are identical by construction — the
    artifact IS the computed list; bench's per-query models.clear() keeps
    cold runs honest (r9, guide §1.2 step 1 / §5 driver)."""
    from .models import published

    return published(
        df,
        "exact_quantiles",
        (col, tuple(ps)),
        lambda: _exact_quantiles_compute(df, col, ps),
    )


def _exact_quantiles_compute(df: DataFrame, col: str, ps: list[float]) -> list[float]:
    """EXACT interpolated quantiles (quantile_cont semantics) computed the
    way that scales: never a full value-buffer aggregate.

    Spark's exact `percentile` aggregate buffers every (value, count) pair
    into one final merge task — at 100 TB that buffer IS the dataset and
    the single merge is the bottleneck (measured: 2.3 s over 600 k rows at
    sf0.1 on 3 input splits). This implementation is the classic two-pass
    exact selection:

      1. BRACKET — one map-side-combinable GK sketch pass
         (percentile_approx, accuracy A) brackets each target quantile at
         p ± 3/A (GK guarantees rank error ≤ n/A, i.e. ±1/A in p-space);
      2. REFINE — one scan counts rows strictly below each bracket and
         collects the ~6n/A values inside it (conditional aggregates, all
         targets in the same pass), so the needed order statistics land on
         the driver with exact global ranks;
      3. interpolate x[l] + (h-l)·(x[l+1]-x[l]) with h=(n-1)·p driver-side
         — the identical IEEE arithmetic both Spark's `percentile` and
         DuckDB's `quantile_cont` apply, so results are bit-exact.

    Work is two scan-stage passes with O(|targets|·n/A) driver transfer —
    at 100 TB, A scales with n to keep the refine window fixed-size. If a
    pathological distribution defeats the bracket (GK bound violated only
    by bugs, but belt-and-braces), falls back to the exact buffer form."""
    acc = 10_000
    delta = 3.0 / acc
    brackets = [(max(0.0, p - delta), min(1.0, p + delta)) for p in ps]
    probe = sorted({b for lohi in brackets for b in lohi})
    row = df.agg(
        F.count(F.col(col)).alias("n"),
        F.percentile_approx(col, probe, acc).alias("qs"),
    ).collect()[0]
    n = row["n"]
    if n == 0:  # no non-null values: every quantile is NULL (as percentile's)
        return [None] * len(ps)
    qs = dict(zip(probe, row["qs"]))
    aggs = []
    for i, (lo_p, hi_p) in enumerate(brackets):
        lo_v, hi_v = qs[lo_p], qs[hi_p]
        aggs.append(
            F.sum(F.when(F.col(col) < F.lit(lo_v), 1).otherwise(0)).alias(f"below{i}")
        )
        aggs.append(
            F.sort_array(
                F.collect_list(F.when(F.col(col).between(F.lit(lo_v), F.lit(hi_v)), F.col(col)))
            ).alias(f"win{i}")
        )
    ref = df.agg(*aggs).collect()[0]
    out = []
    for i, p in enumerate(ps):
        h = (n - 1) * p
        l = int(h)  # floor for h >= 0
        below, win = ref[f"below{i}"], ref[f"win{i}"]
        # ranks covered by the window: [below+1, below+len(win)] (1-indexed);
        # we need ranks l+1 and min(l+2, n)
        hi_rank = l + 2 if l + 1 < n else l + 1
        if not (below + 1 <= l + 1 and hi_rank <= below + len(win)):  # pragma: no cover
            exact = df.agg(
                F.expr(f"percentile({col}, array({', '.join(map(repr, ps))}))")
            ).collect()[0][0]
            return [float(v) for v in exact]
        x_l = win[l - below]
        x_l1 = win[hi_rank - 1 - below]
        out.append(x_l + (h - l) * (x_l1 - x_l))
    return out


# -- winsorized robust statistics -------------------------------------------

WINSOR_LO = 0.05
WINSOR_HI = 0.95


def winsorized_stats(lineitem: DataFrame, col: str = "l_extendedprice") -> DataFrame:
    """Robust mean/stddev of a numeric column after winsorizing at the
    [5th, 95th] exact percentiles — the outlier-resistant summary that
    drives clipping thresholds in feature pipelines. One row:
    (p_lo, p_hi, mean_raw, mean_winsor, std_raw, std_winsor).

    Scale shape: the percentile bounds are ONE exact-percentile aggregate
    (sort-based partial state, never a collect) broadcast back as a 1-row
    cross join; the clip is a scan-stage least/greatest; both moment sets
    ride a single two-phase aggregate. At 100 TB the exact percentile
    swaps for a t-digest sketch, as with curriculum binning."""
    c = F.col(col)
    # The bounds come from `exact_quantiles` (sketch-bracket + exact-refine
    # above): identical values to the exact `percentile` aggregate, but two
    # parallel scan passes instead of one value-buffer merge task
    # (2.3 → ~0.6 s at sf0.1, and the buffer no longer scales with n).
    # The r2 single-buffer form is kept in the docstring history: the exact
    # aggregate's cost IS its buffer, which is why this operator's scale
    # path computes selection, not aggregation.
    p_lo, p_hi = exact_quantiles(lineitem, col, [WINSOR_LO, WINSOR_HI])
    clipped = F.least(F.greatest(c, F.lit(p_lo)), F.lit(p_hi))
    return lineitem.agg(
        F.round(F.lit(p_lo), 6).alias("p_lo"),
        F.round(F.lit(p_hi), 6).alias("p_hi"),
        F.round(F.avg(c), 6).alias("mean_raw"),
        F.round(F.avg(clipped), 6).alias("mean_winsor"),
        F.round(F.stddev_pop(c), 6).alias("std_raw"),
        F.round(F.stddev_pop(clipped), 6).alias("std_winsor"),
    )


def winsorized_stats_oracle(col: str = "l_extendedprice") -> str:
    clip = f"least(greatest({col}, b.p_lo), b.p_hi)"
    return f"""
        WITH b AS (
          SELECT quantile_cont({col}, {WINSOR_LO}) AS p_lo,
                 quantile_cont({col}, {WINSOR_HI}) AS p_hi
          FROM lineitem)
        SELECT ROUND(first(b.p_lo), 6) AS p_lo,
               ROUND(first(b.p_hi), 6) AS p_hi,
               ROUND(avg({col}), 6) AS mean_raw,
               ROUND(avg({clip}), 6) AS mean_winsor,
               ROUND(stddev_pop({col}), 6) AS std_raw,
               ROUND(stddev_pop({clip}), 6) AS std_winsor
        FROM lineitem CROSS JOIN b
    """


# -- declarative constraint validation --------------------------------------


def constraint_violations(orders: DataFrame, customer: DataFrame) -> DataFrame:
    """(check_name, n_violations): the data-contract check a pipeline runs
    on every snapshot — NOT-NULL and range constraints as scan-stage
    filtered counts sharing ONE pass over orders, plus referential
    integrity (every o_custkey resolves in customer) as a broadcast
    anti-join count. A violation count of zero per row is the contract;
    the row stays in the report so silence is distinguishable from a
    missing check."""
    checks = {
        "o_orderkey_not_null": F.col("o_orderkey").isNull(),
        "o_totalprice_positive": ~(F.col("o_totalprice") > 0),
        "o_orderstatus_in_domain": ~F.col("o_orderstatus").isin("O", "F", "P"),
        "o_orderdate_in_range": ~F.col("o_orderdate").between(
            "1990-01-01", "2100-01-01"
        ),
    }
    scan = orders.agg(
        *[
            F.sum(F.when(cond, 1).otherwise(0)).cast("bigint").alias(name)
            for name, cond in checks.items()
        ]
    )
    stack = ", ".join(f"'{n}', {n}" for n in checks)
    per_col = scan.select(
        F.expr(f"stack({len(checks)}, {stack}) AS (check_name, n_violations)")
    )
    orphans = (
        orders.join(
            F.broadcast(customer.select("c_custkey")),
            orders.o_custkey == F.col("c_custkey"),
            "left_anti",
        )
        .agg(F.count("*").cast("bigint").alias("n_violations"))
        .select(F.lit("o_custkey_references_customer").alias("check_name"), "n_violations")
    )
    return per_col.unionAll(orphans)


def constraint_violations_oracle() -> str:
    return """
        SELECT 'o_orderkey_not_null' AS check_name,
               CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_violations FROM orders
        UNION ALL
        SELECT 'o_totalprice_positive',
               CAST(sum(CASE WHEN NOT (o_totalprice > 0) THEN 1 ELSE 0 END) AS BIGINT)
          FROM orders
        UNION ALL
        SELECT 'o_orderstatus_in_domain',
               CAST(sum(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P') THEN 1 ELSE 0 END)
                    AS BIGINT)
          FROM orders
        UNION ALL
        SELECT 'o_orderdate_in_range',
               CAST(sum(CASE WHEN o_orderdate NOT BETWEEN TIMESTAMP '1990-01-01'
                                  AND TIMESTAMP '2100-01-01' THEN 1 ELSE 0 END)
                    AS BIGINT)
          FROM orders
        UNION ALL
        SELECT 'o_custkey_references_customer',
               CAST(count(*) AS BIGINT)
          FROM orders o
          WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
    """


# ---------------------------------------------------------------------------
# semantic (embedding-space) source drift — the vector companion of the
# token-count PSI monitor above
# ---------------------------------------------------------------------------


def embedding_source_drift(docs: DataFrame) -> DataFrame:
    """(source, n_docs, cos_sim, drift): each source's mean document
    embedding compared to the corpus mean by cosine — the SEMANTIC drift
    check next to the distributional one (`source_drift_psi`): a feed can
    keep its token-count histogram while its content shifts topic, and
    the embedding centroid moves where the token bins cannot.

    Rides the published hashed-embedding table (one tokenize+hash pass per
    corpus snapshot, shared with the vector family); the mean vectors are
    the k-means UPDATE half re-used as a report — posexplode to
    (source, pos, val), two-phase avg keyed on (source, pos) (map-side
    combined: dim·|sources| partial sums per task regardless of corpus
    size), components ROUNDed to 6 dp so summation order cannot shift the
    comparison across engines (the kmeans discipline). drift = 1 − cosine,
    both rounded."""
    from .ranking import hashed_doc_embeddings
    from .similarity import cosine_spark

    emb = hashed_doc_embeddings(docs)
    # (Expressions as parsed SQL strings — the r9 py4j-chatter rule;
    # identical analyzed trees.)
    flat = emb.join(docs.select("doc_id", "source"), "doc_id").selectExpr(
        "source", "posexplode(embedding) AS (pos, val)"
    )
    vec_sql = (
        "transform(array_sort(collect_list(struct(pos, val))), s -> s.val)"
    )

    def _vec(grouped, keys):
        return grouped.groupBy(*keys).agg(F.expr(vec_sql).alias("v"))

    smean = flat.groupBy("source", "pos").agg(
        F.expr("round(avg(val), 6)").alias("val")
    )
    svec = _vec(smean, ["source"]).withColumnRenamed("v", "mvec")
    cmean = flat.groupBy("pos").agg(F.expr("round(avg(val), 6)").alias("val"))
    cvec = _vec(cmean.selectExpr("*", "1 AS g"), ["g"]).selectExpr("v AS cvec")
    n = docs.groupBy("source").agg(
        F.expr("CAST(count(*) AS BIGINT)").alias("n_docs")
    )
    cos = cosine_spark("mvec", "cvec")
    return (
        svec.crossJoin(F.broadcast(cvec))
        .join(F.broadcast(n), "source")
        .selectExpr(
            "source",
            "n_docs",
            f"{cos} AS cos_sim",
            f"ROUND(1 - ({cos}), 6) AS drift",
        )
    )


def embedding_source_drift_oracle() -> str:
    from .ranking import EMBED_DIM, hashed_doc_embeddings_oracle
    from .similarity import cosine_duck

    cos = cosine_duck("s.mvec", "c.cvec")
    return f"""
        WITH emb AS MATERIALIZED ({hashed_doc_embeddings_oracle()}),
        flat AS MATERIALIZED (
          SELECT d.source, g.pos - 1 AS pos,
                 CAST(e.embedding[g.pos] AS DOUBLE) AS val
          FROM emb e JOIN documents d USING (doc_id)
          CROSS JOIN generate_series(1, {EMBED_DIM}) g(pos)),
        smean AS (SELECT source, pos, ROUND(avg(val), 6) AS val
                  FROM flat GROUP BY source, pos),
        svec AS (SELECT source, list(val ORDER BY pos) AS mvec
                 FROM smean GROUP BY source),
        cmean AS (SELECT pos, ROUND(avg(val), 6) AS val FROM flat GROUP BY pos),
        cvec AS (SELECT list(val ORDER BY pos) AS cvec FROM cmean),
        n AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source)
        SELECT s.source, CAST(n.n_docs AS BIGINT) AS n_docs,
               {cos} AS cos_sim,
               ROUND(1 - ({cos}), 6) AS drift
        FROM svec s CROSS JOIN cvec c JOIN n ON n.source = s.source
    """


# ---------------------------------------------------------------------------
# privacy / governance: k-anonymity + l-diversity audit
# ---------------------------------------------------------------------------

K_ANON = 10  # minimum group size per quasi-identifier combination
L_DIV = 3    # minimum distinct sensitive values per group


def k_anonymity_audit(customer: DataFrame) -> DataFrame:
    """(c_nationkey, c_mktsegment, n, l_distinct, k_ok, l_ok): the
    re-identification audit a data-release / training-data governance
    step runs before publishing — every quasi-identifier combination
    (nation × market segment) must hide each member among ≥ K_ANON peers
    (k-anonymity, Sweeney 2002) AND span ≥ L_DIV distinct sensitive
    values (l-diversity, Machanavajjhala et al. 2007; the sensitive
    attribute here is the account-balance band). Groups failing either
    test are the generalize-or-suppress work list.

    One groupBy shuffle over the QI columns; the exact distinct count is
    Spark's two-phase partial-distinct aggregate. At 100 TB the QI
    cardinality (|nation| × |segment|) bounds the reduce side to a
    dimension-sized table regardless of row count."""
    sens = F.floor(F.col("c_acctbal") / 1000).cast("int")
    return (
        customer.groupBy("c_nationkey", "c_mktsegment")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.countDistinct(sens).cast("bigint").alias("l_distinct"),
        )
        .select(
            "c_nationkey",
            "c_mktsegment",
            "n",
            "l_distinct",
            (F.col("n") >= K_ANON).alias("k_ok"),
            (F.col("l_distinct") >= L_DIV).alias("l_ok"),
        )
    )


def k_anonymity_audit_oracle() -> str:
    return f"""
        SELECT c_nationkey, c_mktsegment,
               CAST(count(*) AS BIGINT) AS n,
               CAST(count(DISTINCT CAST(floor(c_acctbal / 1000) AS INT)) AS BIGINT)
                 AS l_distinct,
               count(*) >= {K_ANON} AS k_ok,
               count(DISTINCT CAST(floor(c_acctbal / 1000) AS INT)) >= {L_DIV} AS l_ok
        FROM customer
        GROUP BY c_nationkey, c_mktsegment
    """
