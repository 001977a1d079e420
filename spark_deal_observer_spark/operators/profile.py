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
    parts = []
    for col, kind in PROFILE_COLS:
        c = F.col(col)
        num = kind == "num"
        parts.append(
            orders.agg(
                F.lit(col).alias("column"),
                F.count("*").alias("n_rows"),
                F.sum(F.when(c.isNull(), 1).otherwise(0)).cast("bigint").alias("n_nulls"),
                F.countDistinct(c).alias("n_distinct"),
                (F.min(c).cast("double") if num else F.lit(None).cast("double")).alias("min_num"),
                (F.max(c).cast("double") if num else F.lit(None).cast("double")).alias("max_num"),
                (F.min(c) if not num else F.lit(None).cast("string")).alias("min_str"),
                (F.max(c) if not num else F.lit(None).cast("string")).alias("max_str"),
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
