#!/usr/bin/env python
"""Exchange-reuse census over EXECUTED final plans (r9).

AQE reuse is invisible in every pre-execution plan string (see the verify
skill): run each registered query with collect(), then read
explain("formatted") and require isFinalPlan=true before counting
Reused* nodes and per-table scans. Queries where the same source table is
scanned more than once AND nothing is reused are the candidates for the
duplicate-subtree root-cause pass (pruning vs pushdown vs genuinely
different subtrees).

Usage: python scripts/reuse_census.py [sf_dir] [query ...]
Writes /tmp/reuse_census.json. Runs WARM (no models.clear()): the warm
plan is what every steady-state execution pays; cold/training plans are
audited separately per family.
"""

from __future__ import annotations

import contextlib
import io
import json
import re
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

ARGS = sys.argv[1:]
SF_DIR = ARGS[0] if ARGS and "/" in ARGS[0] else "/root/testdata/sf0.001"
ONLY = [a for a in ARGS if "/" not in a]


def main() -> int:
    from spark_deal_observer_spark.plans.registry import DRIVER_ORDER, REGISTRY
    from spark_deal_observer_spark.session import get_spark

    spark = get_spark("reuse-census")
    spark.sparkContext.setLogLevel("ERROR")

    names = list(DRIVER_ORDER) + [n for n in REGISTRY if n not in DRIVER_ORDER]
    if ONLY:
        names = [n for n in names if n in ONLY]
    out = {}
    for name in names:
        t0 = time.time()
        try:
            df = REGISTRY[name].fn(spark, SF_DIR)
            df.collect()
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            p = buf.getvalue()
            final = "isFinalPlan=true" in p
            reused = p.count("ReusedExchange") + p.count("ReusedSubquery")
            # per-table scan counts from the operator list (header lines only)
            scans: dict[str, int] = {}
            for m in re.finditer(r"Scan parquet\s*\[?([A-Za-z0-9_./-]*)", p):
                key = m.group(1) or "?"
                scans[key] = scans.get(key, 0) + 1
            # formatted output mentions each scan twice (tree + detail):
            # halve on the tree side by counting "(N) Scan parquet" entries
            tree_scans: dict[str, int] = {}
            for m in re.finditer(r"\(\d+\) Scan parquet ?([^\n ]*)", p):
                key = m.group(1) or "?"
                tree_scans[key] = tree_scans.get(key, 0) + 1
            dup_tables = {k: v for k, v in tree_scans.items() if v >= 2}
            out[name] = {
                "final": final,
                "reused": reused,
                "scans": tree_scans,
                "dup_tables": dup_tables,
                "s": round(time.time() - t0, 2),
            }
            flag = " <== DUP" if dup_tables and not reused else ""
            print(
                f"{name}: reused={reused} scans={sum(tree_scans.values())} "
                f"dup={dup_tables}{flag} ({out[name]['s']}s)",
                flush=True,
            )
        except Exception as e:  # noqa: BLE001
            out[name] = {"error": f"{type(e).__name__}: {str(e)[:200]}"}
            print(f"{name}: ERROR {out[name]['error']}", flush=True)
    Path("/tmp/reuse_census.json").write_text(json.dumps(out, indent=1))
    flagged = [n for n, v in out.items() if v.get("dup_tables") and not v.get("reused")]
    print(f"\nflagged ({len(flagged)}): {flagged}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
