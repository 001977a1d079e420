"""Count–min sketch over token streams — the fixed-size frequency summary
for cardinalities where the exact heavy-hitter count (`ngram_heavy_hitters`)
stops fitting: at 100 TB the distinct-gram space outgrows any exact
two-phase count, while the CMS stays depth×width counters REGARDLESS of
corpus size, merges associatively (map-side combine IS the sketch merge),
and answers point frequency queries with a one-sided error bound
(est ≥ true; est ≤ true + εN with prob 1−δ, ε = e/width, δ = e^−depth).

The registered query builds the sketch AND audits it: probe tokens are
counted exactly and estimated from the sketch side-by-side, so the
result doubles as the overcount report (the oracle replays the identical
deterministic construction — portable md5 hashing, no RNG — making even
the sketch itself value-checkable, which an opaque sketch blob is not).

Scale shape: aggregate to the vocabulary first (map-side combined — tokens
≪ occurrences), then hash each DISTINCT token depth× and sum into
(row, cell) — md5 cost scales with |vocab|·depth, not corpus·depth, and
the (row, cell) shuffle is bounded by depth×width keys per task (map-side
combine IS the CMS merge property, in plan form); the probe estimate is a
broadcast join over depth·|probes| rows. The streaming analog merges
per-batch sketches by summing the same (row, cell) keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import hash32_sql, tokens_sql

CMS_DEPTH = 4
CMS_WIDTH = 1024
# Probes: two corpus-frequent terms, two mid, one absent (est must be ≥ 0
# true count and shows pure collision noise).
CMS_PROBES: tuple[str, ...] = ("join", "hash", "scan", "the", "zzz-absent")


def _cell(dialect: str, d: str, token: str) -> str:
    """Row-d hash cell of a token: seeded by prefixing the row index."""
    s = "STRING" if dialect == "spark" else "VARCHAR"
    return (
        f"{hash32_sql(f'concat(CAST({d} AS {s}), chr(58), {token})', dialect)}"
        f" % {CMS_WIDTH}"
    )


def cms_token_counts(docs: DataFrame) -> DataFrame:
    """(token, true_cnt, cms_est): exact vs sketch-estimated corpus
    frequency for the probe tokens, from a depth×width count-min sketch
    built over every token occurrence."""
    # Aggregate to the VOCABULARY first (map-side combined — tokens ≪
    # occurrences), then hash each distinct token once per row: the md5
    # cost scales with |vocab|·depth, not corpus·depth, and the sketch sums
    # are identical (Σ per-token counts = per-occurrence increments).
    tok_counts = (
        docs.select(F.explode(F.expr(tokens_sql("spark", "text"))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
    )
    rows = tok_counts.select(
        "token",
        "cnt",
        F.explode(
            F.array(*[F.lit(d) for d in range(CMS_DEPTH)])
        ).alias("d"),
    )
    sketch = (
        rows.select("d", F.expr(_cell("spark", "d", "token")).alias("cell"), "cnt")
        .groupBy("d", "cell")
        .agg(F.sum("cnt").alias("cnt"))
    )
    spark = docs.sparkSession
    probes = spark.createDataFrame(
        [(t,) for t in CMS_PROBES], "token STRING"
    ).crossJoin(
        spark.range(CMS_DEPTH).select(F.col("id").cast("int").alias("d"))
    ).select("token", "d", F.expr(_cell("spark", "d", "token")).alias("cell"))
    est = (
        probes.join(sketch, ["d", "cell"], "left")
        .groupBy("token")
        .agg(F.min(F.coalesce("cnt", F.lit(0))).cast("bigint").alias("cms_est"))
    )
    true = tok_counts.where(F.col("token").isin(*CMS_PROBES)).select(
        "token", F.col("cnt").alias("true_cnt")
    )
    return (
        est.join(true, "token", "left")
        .select(
            "token",
            F.coalesce("true_cnt", F.lit(0)).cast("bigint").alias("true_cnt"),
            "cms_est",
        )
    )


def cms_token_counts_oracle() -> str:
    toks = tokens_sql("duckdb", "text")
    cell = _cell("duckdb", "d", "token")
    probe_list = ", ".join(f"('{t}')" for t in CMS_PROBES)
    return f"""
        WITH toks AS (SELECT unnest({toks}) AS token FROM documents),
        tok_counts AS (SELECT token, count(*) AS cnt FROM toks GROUP BY token),
        rows_ AS (SELECT token, cnt, g.d FROM tok_counts
                  CROSS JOIN generate_series(0, {CMS_DEPTH - 1}) g(d)),
        sketch AS (SELECT d, {cell} AS cell, sum(cnt) AS cnt
                   FROM rows_ GROUP BY d, {cell}),
        probes AS (SELECT token, g.d, {cell} AS cell
                   FROM (VALUES {probe_list}) p(token)
                   CROSS JOIN generate_series(0, {CMS_DEPTH - 1}) g(d)),
        est AS (SELECT p.token,
                       CAST(min(COALESCE(s.cnt, 0)) AS BIGINT) AS cms_est
                FROM probes p LEFT JOIN sketch s USING (d, cell)
                GROUP BY p.token),
        tru AS (SELECT token, cnt AS true_cnt FROM tok_counts
                WHERE token IN (SELECT token FROM est))
        SELECT e.token, CAST(COALESCE(t.true_cnt, 0) AS BIGINT) AS true_cnt,
               e.cms_est
        FROM est e LEFT JOIN tru t USING (token)
    """
