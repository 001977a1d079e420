#!/usr/bin/env python
"""Suite → component timing attribution (VERDICT r4 item 8).

The gate's compound "suite" queries melt whole families into one slot, so
a full-sweep regression inside a 4 s suite is not attributable from the
suite number alone. This script runs ONE full-catalog sweep (every
DRIVER_ORDER query, single run, noop sink, $SPARK_GRAFT_SF_DIR) and
prints (a) the sweep JSON to a file and (b) a markdown table mapping each
suite to its components with their INDIVIDUAL timings from the same
sweep — the components are registered queries themselves, so the
attribution costs nothing beyond the sweep the playbook already runs per
round.

Usage: python scripts/suite_breakdown.py [out_json]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    out_json = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sweep_catalog.json"

    from spark_deal_observer_spark import benchkit
    from spark_deal_observer_spark.plans.registry import (
        DRIVER_ORDER,
        REGISTRY,
        SUITE_COMPONENTS,
    )
    from spark_deal_observer_spark.session import get_spark

    # Same measurement path as bench.py/sweep_sf01.py (benchkit): refuse
    # a loaded box, time via the shared noop-sink runner, stamp the
    # artifact — so the repo can never again carry two conflicting
    # numbers for one query with no way to tell which was contaminated.
    start_load, waited = benchkit.guard_load(label="suite-breakdown", refuse=True)

    spark = get_spark("suite-breakdown")
    spark.sparkContext.setLogLevel("ERROR")
    benchkit.warm_session(spark)

    times: dict[str, float] = {}
    t_all = time.perf_counter()
    for name in DRIVER_ORDER:
        times[name] = round(benchkit.time_noop(spark, REGISTRY[name].fn, SF), 3)
        print(f"DONE {name} {times[name]:.3f}", flush=True)
    total = round(time.perf_counter() - t_all, 1)
    Path(out_json).write_text(
        json.dumps(
            {
                "sf_dir": SF,
                "total_s": total,
                "times": times,
                **benchkit.loadstamp(start_load, waited_s=waited),
            },
            indent=1,
        )
    )
    print(f"\nswept {len(times)} queries in {total}s -> {out_json}\n")

    print("| suite | suite sec | component | component sec |")
    print("|---|---|---|---|")
    for suite, comps in SUITE_COMPONENTS.items():
        if suite not in times:
            continue
        first = True
        for c in comps:
            s_cell = f"{suite} | {times[suite]:.2f}" if first else " | "
            c_t = f"{times[c]:.2f}" if c in times else "n/a"
            print(f"| {s_cell} | {c} | {c_t} |")
            first = False


if __name__ == "__main__":
    main()
