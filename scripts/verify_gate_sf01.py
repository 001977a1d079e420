#!/usr/bin/env python
"""Value-level oracle verification of the DRIVER GATE (first 50 of
DRIVER_ORDER) at sf0.1 — the scale-dependent-value-bug catcher the r5
verdict asked for (#5): the driver's correctness gate proves values at
sf0.01 and the bench runs sf0.1 but only checks time, so rounding drift,
overflow, and sampling-fraction edge cases that only appear at 10× the
rows would slip through. Run once per round (uncontended) and record the
result in COVERAGE.md.

Usage: python scripts/verify_gate_sf01.py [sf_dir] [name ...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()
GATE_SLOTS = 50


def norm(v):
    if v is None or (isinstance(v, float) and v != v):
        return None
    if isinstance(v, float):
        return round(v, 9)
    if hasattr(v, "to_pydatetime"):
        try:
            return v.to_pydatetime()
        except Exception:
            return None
    return v


def _substitute_cc(con) -> tuple[str, str]:
    """The recursive-CTE connected-components oracle computes the FULL
    transitive closure — O(Σ|component|²) rows, fine at sf0.01 but a
    multi-hour wall at sf0.1 where the duplicate-dense fixture yields a
    1.5M-edge near-clique pair graph (measured: >20 min on one query).
    For this harness the CC block is verified against an equally
    independent but tractable exact oracle: DuckDB computes the LSH pair
    graph, pure-Python union-find labels the components, and the result
    is registered as a table that textually replaces the recursive block
    inside every gate oracle embedding it. Value semantics identical
    (cluster = component-min doc id, nodes = edge endpoints)."""
    from spark_deal_observer_spark.operators import dedup as dd

    cc_sql = dd.connected_components_oracle(dd.minhash_lsh_pairs_oracle())
    pairs = con.execute(dd.minhash_lsh_pairs_oracle()).fetchall()
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    rows = [(n, find(n)) for n in parent]
    con.execute("CREATE TABLE cc_uf(doc_id BIGINT, cluster BIGINT)")
    con.executemany("INSERT INTO cc_uf VALUES (?, ?)", rows)
    print(
        f"cc union-find: {len(pairs)} edges -> {len(rows)} labeled nodes",
        flush=True,
    )
    return cc_sql, "SELECT doc_id, cluster FROM cc_uf"


def main() -> int:
    from spark_deal_observer_spark.plans.registry import DRIVER_ORDER, REGISTRY
    from spark_deal_observer_spark.session import get_spark

    only = set(sys.argv[2:])
    gate = [n for n in DRIVER_ORDER[:GATE_SLOTS] if not only or n in only]
    spark = get_spark("gate-sf01")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    cc_sql, cc_sub = _substitute_cc(con)

    fail: list[tuple[str, str]] = []
    t0 = time.time()
    for i, name in enumerate(gate):
        q = REGISTRY[name]
        try:
            sdf = q.fn(spark, SF_DIR)
            cols = sorted(sdf.columns)
            srows = sorted(
                (tuple(norm(r[c]) for c in cols) for r in sdf.collect()),
                key=repr,
            )
            if q.oracle is None:
                print(f"[{i + 1}/{len(gate)}] {name}: rows-only ({len(srows)})", flush=True)
                continue
            rel = con.sql(q.oracle.replace(cc_sql, cc_sub))
            ocols_raw = list(rel.columns)
            if cols != sorted(ocols_raw):
                fail.append((name, f"schema {cols} vs {sorted(ocols_raw)}"))
                print(f"[{i + 1}/{len(gate)}] {name}: SCHEMA MISMATCH", flush=True)
                continue
            idx = [ocols_raw.index(c) for c in cols]
            orows = sorted(
                (tuple(norm(row[j]) for j in idx) for row in rel.fetchall()),
                key=repr,
            )
            if srows != orows:
                a = [r for r in srows if r not in set(orows)][:2]
                b = [r for r in orows if r not in set(srows)][:2]
                fail.append((name, f"values: spark-only {a} oracle-only {b}"))
                print(f"[{i + 1}/{len(gate)}] {name}: VALUE MISMATCH", flush=True)
            else:
                print(
                    f"[{i + 1}/{len(gate)}] {name}: ok ({len(srows)} rows)",
                    flush=True,
                )
        except Exception as e:  # noqa: BLE001
            fail.append((name, f"error: {e}"))
            print(f"[{i + 1}/{len(gate)}] {name}: ERROR {e}", flush=True)

    print(
        f"\ngate@{SF_DIR}: {len(gate)} slots in {time.time() - t0:.0f}s; "
        f"{len(fail)} failures"
    )
    for name, why in fail:
        print(f"  FAIL {name}: {why[:400]}")
    return 1 if fail else 0


if __name__ == "__main__":
    sys.exit(main())
