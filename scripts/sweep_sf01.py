#!/usr/bin/env python
"""Time EVERY registered query once at sf0.1 (DRIVER_ORDER, one session)
and write SWEEP_SF01.json — the hidden-hot-spot catcher: headline bench
covers only the HEADLINE list, and the 29 s string-array Jaccard verify
was found by exactly this sweep. Single run per query; queries appearing
after a same-artifact trainer read the published artifact (warm), which
matches the sweep's steady-state intent — cold numbers live in
BENCH_DETAIL.json's cold_s.

Measurement discipline (VERDICT r6 item 1): a contended reading once
faked a 3.5× regression, so this script REFUSES to start while the
1-minute load says another job owns the cores (SPARK_GRAFT_BENCH_FORCE=1
overrides), and the artifact records the load it ran under.

--warm (VERDICT r6 item 7): after the main pass, re-run just the
compound suite queries against the now-fully-published artifact registry
and record `suite_times_warm` + `total_warm_s` alongside the main
totals — one artifact that separates operator cost (warm suite) from
training cost (main-pass suite minus warm suite).

Usage: python scripts/sweep_sf01.py [sf_dir] [--warm]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

ARGS = [a for a in sys.argv[1:] if not a.startswith("--")]
WARM = "--warm" in sys.argv[1:]
SF_DIR = ARGS[0] if ARGS else "/root/testdata/sf0.1"


def main() -> int:
    from spark_deal_observer_spark import benchkit
    from spark_deal_observer_spark.plans.registry import (
        DRIVER_ORDER,
        REGISTRY,
        SUITE_COMPONENTS,
    )
    from spark_deal_observer_spark.session import get_spark

    start_load, waited = benchkit.guard_load(label="sweep", refuse=True)

    spark = get_spark("sweep-sf01")
    spark.sparkContext.setLogLevel("ERROR")
    benchkit.warm_session(spark)

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
    suite_warm: dict[str, float] = {}
    for name in sweep_names:
        try:
            times[name] = round(
                benchkit.time_noop(spark, REGISTRY[name].fn, SF_DIR), 3
            )
            if WARM and name in SUITE_COMPONENTS:
                # Warm re-run IMMEDIATELY, while this suite's published
                # artifacts are live — a deferred warm pass at the end of
                # the 240-query sweep found them LRU-EVICTED and silently
                # re-measured training (graph_suite "warm" read 31 s vs
                # its true 0.8 s warm).
                suite_warm[name] = round(
                    benchkit.time_noop(spark, REGISTRY[name].fn, SF_DIR), 3
                )
        except Exception as e:  # noqa: BLE001
            errs[name] = str(e)[:300]
            print(f"{name}: ERROR {e}", flush=True)
    total = round(time.time() - t_all, 1)

    out = {
        "sf_dir": SF_DIR,
        "total_s": total,
        "times": times,
        **benchkit.loadstamp(start_load, waited_s=waited),
    }

    if WARM:
        # total_s includes the extra warm re-runs; the two derived totals
        # separate operator cost (warm suites) from training cost.
        cold_suite = sum(times.get(n, 0.0) for n in suite_warm)
        out["suite_times_warm"] = suite_warm
        out["suite_training_s"] = round(
            cold_suite - sum(suite_warm.values()), 1
        )
        out["total_warm_s"] = round(
            sum(times.values()) - cold_suite + sum(suite_warm.values()), 1
        )

    if errs:
        out["errors"] = errs
    (REPO / "SWEEP_SF01.json").write_text(json.dumps(out, indent=1) + "\n")
    summary = {"total_s": out["total_s"], "n": len(times), "errs": len(errs)}
    if WARM:
        summary["total_warm_s"] = out["total_warm_s"]
    print(json.dumps(summary))
    for k, v in sorted(times.items(), key=lambda kv: -kv[1])[:20]:
        print(f"{k}: {v}", flush=True)
    return 1 if errs else 0


if __name__ == "__main__":
    sys.exit(main())
