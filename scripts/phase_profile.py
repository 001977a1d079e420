#!/usr/bin/env python
"""Split a query's WARM time into plan-build / optimize+physical-plan /
execute phases (guide §1: find out whether suite warm cost is driver
planning, codegen, or compute before touching anything).

Usage: python scripts/phase_profile.py <query> [<query> ...]

Methodology: mimic bench.py — models.clear(), one full cold noop run
(publishes artifacts, warms codegen), then the phase breakdown on the
warm path:
  build_s  = Python DataFrame construction (registry fn)
  plan_s   = .queryExecution().executedPlan() forced (analysis +
             optimization + physical planning, pre-AQE)
  exec_s   = noop write of a freshly built frame (total warm) — so
             exec-only ≈ exec_s - build_s - plan_s (AQE replanning and
             codegen live inside exec_s; a second exec_s shows
             run-to-run warm spread).
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    names = sys.argv[1:]
    from spark_deal_observer_spark import benchkit
    from spark_deal_observer_spark.operators import models
    from spark_deal_observer_spark.plans.registry import REGISTRY
    from spark_deal_observer_spark.session import get_spark

    spark = get_spark("phase-profile")
    spark.sparkContext.setLogLevel("ERROR")
    benchkit.warm_session(spark)

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    print(f"{'query':32s} {'cold':>7s} {'build':>7s} {'plan':>7s} "
          f"{'exec1':>7s} {'exec2':>7s}")
    for name in names:
        fn = REGISTRY[name].fn
        models.clear()
        t0 = time.perf_counter()
        noop(fn(spark, SF))
        cold = time.perf_counter() - t0

        t0 = time.perf_counter()
        df = fn(spark, SF)
        build = time.perf_counter() - t0

        t0 = time.perf_counter()
        df._jdf.queryExecution().executedPlan()
        plan = time.perf_counter() - t0

        t0 = time.perf_counter()
        noop(fn(spark, SF))
        exec1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        noop(fn(spark, SF))
        exec2 = time.perf_counter() - t0
        print(f"{name:32s} {cold:7.2f} {build:7.2f} {plan:7.2f} "
              f"{exec1:7.2f} {exec2:7.2f}", flush=True)


if __name__ == "__main__":
    main()
