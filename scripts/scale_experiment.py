#!/usr/bin/env python
"""1× vs 10× (vs 100×) scaling experiment (SCALE.md §4), reproducibly.

Synthesizes a 10× corpus from $SPARK_GRAFT_SF_DIR (default sf0.1) into
$SCALE10X_DIR (default /tmp/scale10x): 10 id-shifted copies of events /
documents / embeddings, document texts perturbed per copy, embeddings
nudged per copy — the same protocol as the r2 experiment. Then times the
query names given on the command line (default: the round-3 additions) at
1× and 10× (min-of-2, noop sink) and prints a markdown table.

`--x100` adds a THIRD decade: a 100× corpus (same id-shift/perturb
protocol, 100 copies ≈ sf10-equivalent row counts for the scaled tables)
in $SCALE100X_DIR (default /tmp/scale100x), timing the headline LINEAR
families across all three points so the claimed exponents are measured
over two decades, not one. Pair-OUTPUT queries stay excluded there by
the standing quadratic-semantics rule (100 copies of a document means
~10 000× its true near-dup pairs — that is the semantics, not a cost).

Usage: python scripts/scale_experiment.py [--skew] [--x100] [query ...]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DST = os.environ.get("SCALE10X_DIR", "/tmp/scale10x")
DST100 = os.environ.get("SCALE100X_DIR", "/tmp/scale100x")
COPIES = 10

DEFAULT_QUERIES = [
    "kmeans_cells",
    "ann_ivf_kmeans",
    "tfidf_top_terms",
    "bm25_scores",
    "grouped_topk_docs",
    "stratified_sample",
    "interval_range_join",
    "hypertable_rollup",
    "dedup_minhash_lsh",
    "dedup_clusters",
    # r4 extension: composed/compressed ANN tiers, graph + basket family,
    # governance + layout-ops reports
    "ann_ivf_pq",
    "ann_ivf_pq_residual",
    "ann_sq8",
    "graph_communities",
    "copurchase_pairs",
    "privacy_kanon_audit",
    "join_key_skew_report",
    "compaction_plan",
    "dedup_lines",
    "event_anomaly_zscore",
    "event_transition_matrix",
    "prototype_classifier_eval",
]


COPY_TARGETS = ("documents", "events", "embeddings", "orders", "lineitem")


def _clean_copy_targets(dst: str) -> None:
    """Remove any pre-existing COPY target in `dst` BEFORE writing.

    Earlier revisions symlinked orders/lineitem into the scale dir; a COPY
    through such a stale symlink would follow it and silently overwrite the
    SOURCE fixture with scaled data. Unlinking first (os.remove removes the
    link itself, never the target) makes that impossible regardless of what
    a previous run left behind."""
    for t in COPY_TARGETS:
        p = os.path.join(dst, f"{t}.parquet")
        if os.path.lexists(p):
            os.remove(p)


def synthesize(con, dst: str = DST, n_copies: int = COPIES) -> None:
    os.makedirs(dst, exist_ok=True)
    _clean_copy_targets(dst)
    n_docs = con.execute(
        f"SELECT max(doc_id) + 1 FROM read_parquet('{SRC}/documents.parquet')"
    ).fetchone()[0]
    n_events = con.execute(
        f"SELECT max(event_id) + 1 FROM read_parquet('{SRC}/events.parquet')"
    ).fetchone()[0]
    n_vecs = con.execute(
        f"SELECT max(vec_id) + 1 FROM read_parquet('{SRC}/embeddings.parquet')"
    ).fetchone()[0]
    copies = f"generate_series(0, {n_copies - 1}) AS g(i)"
    con.execute(
        f"""COPY (
          SELECT doc_id + i * {n_docs} AS doc_id,
                 CASE WHEN i = 0 THEN text ELSE text || ' v' || i END AS text,
                 lang, source, n_chars
          FROM read_parquet('{SRC}/documents.parquet'), {copies}
        ) TO '{dst}/documents.parquet' (FORMAT parquet)"""
    )
    con.execute(
        f"""COPY (
          SELECT event_id + i * {n_events} AS event_id, ts,
                 user_id, event_type, value, props
          FROM read_parquet('{SRC}/events.parquet'), {copies}
        ) TO '{dst}/events.parquet' (FORMAT parquet)"""
    )
    con.execute(
        f"""COPY (
          SELECT vec_id + i * {n_vecs} AS vec_id,
                 list_transform(embedding, x -> x + i * 0.001) AS embedding,
                 label
          FROM read_parquet('{SRC}/embeddings.parquet'), {copies}
        ) TO '{dst}/embeddings.parquet' (FORMAT parquet)"""
    )
    # fact tables scale with the corpus (id-shifted copies; foreign keys into
    # the unscaled dimensions stay valid because custkeys/partkeys repeat)
    n_orders = con.execute(
        f"SELECT max(o_orderkey) + 1 FROM read_parquet('{SRC}/orders.parquet')"
    ).fetchone()[0]
    for stmt in (
        f"""COPY (
          SELECT o_orderkey + i * {n_orders} AS o_orderkey, o_custkey,
                 o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
          FROM read_parquet('{SRC}/orders.parquet'), {copies}
        ) TO '{dst}/orders.parquet' (FORMAT parquet)""",
        f"""COPY (
          SELECT l_orderkey + i * {n_orders} AS l_orderkey, l_partkey,
                 l_suppkey, l_linenumber, l_quantity, l_extendedprice,
                 l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
          FROM read_parquet('{SRC}/lineitem.parquet'), {copies}
        ) TO '{dst}/lineitem.parquet' (FORMAT parquet)""",
    ):
        con.execute(stmt)
    # pure dimensions are referenced by some queries' table loads only;
    # link them through unchanged so load_table finds every name
    for t in ("region", "nation", "customer", "supplier", "part"):
        dpath = os.path.join(dst, f"{t}.parquet")
        if not os.path.exists(dpath):
            os.symlink(os.path.join(SRC, f"{t}.parquet"), dpath)


SKEW_DST = os.environ.get("SCALE10X_SKEW_DIR", "/tmp/scale10x_skew")

# queries whose skew defenses the stress case exercises: the chunked
# hot-bucket fan-out (dedup_minhash_lsh), the salt-spread join
# (salted_join_dim), the per-key window family (sessionize_events), and
# the AQE-skew-splittable simhash band self-join (dedup_simhash_pairs —
# the boilerplate hot text collapses ~5% of the corpus into one band
# bucket, its exact degenerate case)
SKEW_QUERIES = [
    "dedup_minhash_lsh",
    "salted_join_dim",
    "sessionize_events",
    "dedup_simhash_pairs",
]


def synthesize_skew(con) -> None:
    """10× corpus with DELIBERATE hot keys (SCALE.md §4 skew stress):
    every 20th document (across all copies) carries one identical
    boilerplate text — minhash signatures collide exactly, so all its
    occurrences land in ONE LSH bucket per band (~5% of the corpus in a
    single bucket); and every 5th event is reassigned to user_id 7 (~20%
    of events on one session/join key)."""
    os.makedirs(SKEW_DST, exist_ok=True)
    _clean_copy_targets(SKEW_DST)
    boiler = (
        "terms and conditions apply all rights reserved unsubscribe here "
        "this message was sent automatically do not reply to this email "
        "copyright notice privacy policy cookie settings contact support"
    )
    con.execute(
        f"""COPY (
          SELECT doc_id, CASE WHEN doc_id % 20 = 3 THEN '{boiler}' ELSE text END AS text,
                 lang, source, n_chars
          FROM read_parquet('{DST}/documents.parquet')
        ) TO '{SKEW_DST}/documents.parquet' (FORMAT parquet)"""
    )
    con.execute(
        f"""COPY (
          SELECT event_id, ts,
                 CASE WHEN event_id % 5 = 0 THEN 7 ELSE user_id END AS user_id,
                 event_type, value, props
          FROM read_parquet('{DST}/events.parquet')
        ) TO '{SKEW_DST}/events.parquet' (FORMAT parquet)"""
    )
    for t in ("embeddings", "orders", "lineitem", "region", "nation", "customer",
              "supplier", "part"):
        dst = os.path.join(SKEW_DST, f"{t}.parquet")
        if not os.path.lexists(dst):
            os.symlink(os.path.join(DST, f"{t}.parquet"), dst)


def _time(spark, fn, sf_dir: str) -> float:
    best = float("inf")
    for _ in range(2):
        t = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t)
    return best


# the third-decade set: the headline LINEAR families (signature build,
# star-edge CC, sessionization, salt-spread join, incremental banded
# probe, line dedup, watermark windows). Pair-output enumerators stay
# excluded per the quadratic-semantics rule.
X100_QUERIES = [
    "dedup_minhash_sig",
    "dedup_clusters",
    "sessionize_events",
    "salted_join_dim",
    "dedup_incremental",
    "dedup_lines",
    "windowed_counts",
]


def main() -> None:
    import duckdb

    args = sys.argv[1:]
    skew = "--skew" in args
    x100 = "--x100" in args
    args = [a for a in args if a not in ("--skew", "--x100")]
    names = args or (
        SKEW_QUERIES if skew else (X100_QUERIES if x100 else DEFAULT_QUERIES)
    )
    con = duckdb.connect()
    synthesize(con)
    if skew:
        synthesize_skew(con)
    if x100:
        synthesize(con, DST100, 100)

    from spark_deal_observer_spark.plans.registry import REGISTRY
    from spark_deal_observer_spark.session import get_spark

    spark = get_spark("scale-experiment")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()

    dirs = (
        [("1x", SRC), ("10x", DST)]
        + ([("10x-skew", SKEW_DST)] if skew else [])
        + ([("100x", DST100)] if x100 else [])
    )
    rows = []
    for name in names:
        fn = REGISTRY[name].fn
        timing = {label: _time(spark, fn, sf_dir) for label, sf_dir in dirs}
        rows.append((name, timing))
        print(
            "DONE " + name + " " + " ".join(f"{k}={v:.2f}" for k, v in timing.items()),
            flush=True,
        )

    labels = [label for label, _ in dirs]
    extra = (1 if skew else 0) + (1 if x100 else 0)
    print("\n| query | " + " | ".join(f"{la} sec" for la in labels) + " | ratio |"
          + (" skew ratio |" if skew else "")
          + (" 100x/10x |" if x100 else ""))
    print("|---|" + "---|" * (len(labels) + 1 + extra))
    for name, t in rows:
        cells = " | ".join(f"{t[la]:.2f}" for la in labels)
        line = f"| {name} | {cells} | {t['10x'] / t['1x']:.1f} |"
        if skew:
            line += f" {t['10x-skew'] / t['1x']:.1f} |"
        if x100:
            line += f" {t['100x'] / t['10x']:.1f} |"
        print(line)


if __name__ == "__main__":
    main()
