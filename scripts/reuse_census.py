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
# The data directory may appear anywhere on the command line (ADVICE r9):
# take the one argument containing '/', everything else is a query name.
_DIRS = [a for a in ARGS if "/" in a]
if len(_DIRS) > 1:
    raise SystemExit(f"multiple directory-like args: {_DIRS}")
SF_DIR = _DIRS[0] if _DIRS else "/root/testdata/sf0.001"
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
            final = "isFinalPlan=true" in p or "== Final Plan ==" in p
            # Spark 4's post-execution formatted explain prints the FINAL
            # plan tree, then an "== Initial Plan ==" tree, then ONE
            # details section keyed by node id shared across both trees.
            # Count nodes from the final TREE only (the initial tree would
            # double-count pre-reuse scans — ADVICE r9 / r10), resolving
            # each scan's table from its detail block's Location line.
            tree = p.split("== Initial Plan ==")[0]
            reused = len(re.findall(r"Reused(?:Exchange|Subquery) ?[\w ]*\((\d+)\)", tree))
            tree_scans: dict[str, int] = {}
            for m in re.finditer(r"Scan parquet ?([^\n ]*?) +\((\d+)\)", tree):
                key, nid = m.group(1), m.group(2)
                if not key:
                    det = re.search(
                        rf"\({nid}\) Scan parquet[^\n]*\n(?:[^\n]*\n){{0,8}}?"
                        rf"Location: \w+ \[([^\]]*)\]",
                        p,
                    )
                    key = det.group(1).rstrip("/").rsplit("/", 1)[-1] if det else "?"
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
