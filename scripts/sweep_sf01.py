#!/usr/bin/env python
"""Time EVERY registered query once at sf0.1 (DRIVER_ORDER, one session)
and write SWEEP_SF01.json — the hidden-hot-spot catcher: headline bench
covers only the HEADLINE list, and the 29 s string-array Jaccard verify
was found by exactly this sweep. Single run per query; queries appearing
after a same-artifact trainer read the published artifact (warm), which
matches the sweep's steady-state intent — cold numbers live in
BENCH_DETAIL.json's cold_s. Never run while another Spark job competes
for the cores (a contended reading once faked a 3.5× regression).

Usage: python scripts/sweep_sf01.py [sf_dir]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def main() -> int:
    from spark_deal_observer_spark.plans.registry import DRIVER_ORDER, REGISTRY
    from spark_deal_observer_spark.session import get_spark

    spark = get_spark("sweep-sf01")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()

    times: dict[str, float] = {}
    errs: dict[str, str] = {}
    t_all = time.time()
    # DRIVER_ORDER first (the curated ordering), then every registered
    # query it doesn't list — new operators register before they are
    # curated into the order, and the sweep's whole point is that NOTHING
    # hides outside the timed set (the r5 "212 of 213 swept" finding)
    sweep_names = list(DRIVER_ORDER) + [
        n for n in REGISTRY if n not in set(DRIVER_ORDER)
    ]
    for name in sweep_names:
        t0 = time.time()
        try:
            REGISTRY[name].fn(spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            times[name] = round(time.time() - t0, 3)
        except Exception as e:  # noqa: BLE001
            errs[name] = str(e)[:300]
            print(f"{name}: ERROR {e}", flush=True)
    out = {
        "sf_dir": SF_DIR,
        "total_s": round(time.time() - t_all, 1),
        "times": times,
    }
    if errs:
        out["errors"] = errs
    (REPO / "SWEEP_SF01.json").write_text(json.dumps(out, indent=1) + "\n")
    print(
        json.dumps({"total_s": out["total_s"], "n": len(times), "errs": len(errs)})
    )
    for k, v in sorted(times.items(), key=lambda kv: -kv[1])[:20]:
        print(f"{k}: {v}", flush=True)
    return 1 if errs else 0


if __name__ == "__main__":
    sys.exit(main())
