#!/usr/bin/env python
"""1× vs 10× scaling experiment (SCALE.md §4), reproducibly.

Synthesizes a 10× corpus from $SPARK_GRAFT_SF_DIR (default sf0.1) into
$SCALE10X_DIR (default /tmp/scale10x): 10 id-shifted copies of events /
documents / embeddings, document texts perturbed per copy, embeddings
nudged per copy — the same protocol as the r2 experiment. Then times the
query names given on the command line (default: the round-3 additions) at
1× and 10× (min-of-2, noop sink) and prints a markdown table.

Usage: python scripts/scale_experiment.py [query ...]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DST = os.environ.get("SCALE10X_DIR", "/tmp/scale10x")
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
]


def synthesize(con) -> None:
    os.makedirs(DST, exist_ok=True)
    n_docs = con.execute(
        f"SELECT max(doc_id) + 1 FROM read_parquet('{SRC}/documents.parquet')"
    ).fetchone()[0]
    n_events = con.execute(
        f"SELECT max(event_id) + 1 FROM read_parquet('{SRC}/events.parquet')"
    ).fetchone()[0]
    n_vecs = con.execute(
        f"SELECT max(vec_id) + 1 FROM read_parquet('{SRC}/embeddings.parquet')"
    ).fetchone()[0]
    copies = f"generate_series(0, {COPIES - 1}) AS g(i)"
    con.execute(
        f"""COPY (
          SELECT doc_id + i * {n_docs} AS doc_id,
                 CASE WHEN i = 0 THEN text ELSE text || ' v' || i END AS text,
                 lang, source, n_chars
          FROM read_parquet('{SRC}/documents.parquet'), {copies}
        ) TO '{DST}/documents.parquet' (FORMAT parquet)"""
    )
    con.execute(
        f"""COPY (
          SELECT event_id + i * {n_events} AS event_id, ts,
                 user_id, event_type, value, props
          FROM read_parquet('{SRC}/events.parquet'), {copies}
        ) TO '{DST}/events.parquet' (FORMAT parquet)"""
    )
    con.execute(
        f"""COPY (
          SELECT vec_id + i * {n_vecs} AS vec_id,
                 list_transform(embedding, x -> x + i * 0.001) AS embedding,
                 label
          FROM read_parquet('{SRC}/embeddings.parquet'), {copies}
        ) TO '{DST}/embeddings.parquet' (FORMAT parquet)"""
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
        ) TO '{DST}/orders.parquet' (FORMAT parquet)""",
        f"""COPY (
          SELECT l_orderkey + i * {n_orders} AS l_orderkey, l_partkey,
                 l_suppkey, l_linenumber, l_quantity, l_extendedprice,
                 l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
          FROM read_parquet('{SRC}/lineitem.parquet'), {copies}
        ) TO '{DST}/lineitem.parquet' (FORMAT parquet)""",
    ):
        con.execute(stmt)
    # pure dimensions are referenced by some queries' table loads only;
    # link them through unchanged so load_table finds every name
    for t in ("region", "nation", "customer", "supplier", "part"):
        dst = os.path.join(DST, f"{t}.parquet")
        if not os.path.exists(dst):
            os.symlink(os.path.join(SRC, f"{t}.parquet"), dst)


def main() -> None:
    import duckdb

    names = sys.argv[1:] or DEFAULT_QUERIES
    synthesize(duckdb.connect())

    from spark_deal_observer_spark.plans.registry import REGISTRY
    from spark_deal_observer_spark.session import get_spark

    spark = get_spark("scale-experiment")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()

    rows = []
    for name in names:
        fn = REGISTRY[name].fn
        timing = {}
        for label, sf_dir in (("1x", SRC), ("10x", DST)):
            best = float("inf")
            for _ in range(2):
                t = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t)
            timing[label] = best
        rows.append((name, timing["1x"], timing["10x"]))
        print(f"DONE {name} 1x={timing['1x']:.2f} 10x={timing['10x']:.2f}", flush=True)

    print("\n| query | 1× sec | 10× sec | ratio |")
    print("|---|---|---|---|")
    for name, t1, t10 in rows:
        print(f"| {name} | {t1:.2f} | {t10:.2f} | {t10 / t1:.1f} |")


if __name__ == "__main__":
    main()
