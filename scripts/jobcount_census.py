#!/usr/bin/env python
"""Per-query Spark JOB census over the bench HEADLINE list (r9 VERDICT #5).

On high-syscall-latency sandboxes a Spark job costs a fixed ~60-110 ms
regardless of work, so a warm query's wall is ≈ jobs × latency for the
~80-query sub-second tail. This census counts the jobs each query's COLD
(cleared registry: plan-build probes + training + the timed noop) and WARM
(artifacts live) paths launch, via per-query job groups on the status
tracker — no UI REST dependency. Queries with warm jobs > 1 are the
fold-scalar-probes / hoist-first() candidates.

Usage: python scripts/jobcount_census.py [sf_dir] [query ...]
Writes /tmp/jobcounts.json: {query: {cold_jobs, warm_jobs, cold_s, warm_s}}.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

ARGS = sys.argv[1:]
_DIRS = [a for a in ARGS if "/" in a]
SF_DIR = _DIRS[0] if _DIRS else "/root/testdata/sf0.1"
ONLY = [a for a in ARGS if "/" not in a]


def main() -> int:
    import bench
    from spark_deal_observer_spark.operators import models
    from spark_deal_observer_spark.plans.registry import REGISTRY
    from spark_deal_observer_spark.session import get_spark

    spark = get_spark("jobcensus")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    def run(name: str, tag: str) -> tuple[int, float]:
        group = f"{name}-{tag}"
        sc.setJobGroup(group, name)
        t0 = time.time()
        df = REGISTRY[name].fn(spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        wall = time.time() - t0
        sc.setJobGroup(None, None)
        return len(tracker.getJobIdsForGroup(group)), round(wall, 3)

    names = [n for n in bench.HEADLINE if n in REGISTRY]
    if ONLY:
        names = [n for n in names if n in ONLY]
    out = {}
    for name in names:
        models.clear()
        cold_jobs, cold_s = run(name, "cold")
        warm_jobs, warm_s = run(name, "warm")
        out[name] = {
            "cold_jobs": cold_jobs,
            "warm_jobs": warm_jobs,
            "cold_s": cold_s,
            "warm_s": warm_s,
        }
        print(
            f"{name}: warm {warm_jobs} jobs {warm_s}s | "
            f"cold {cold_jobs} jobs {cold_s}s",
            flush=True,
        )
    Path("/tmp/jobcounts.json").write_text(json.dumps(out, indent=1))
    worst = sorted(out, key=lambda n: -out[n]["warm_jobs"])[:15]
    print("\nmost warm jobs:", [(n, out[n]["warm_jobs"]) for n in worst])
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
