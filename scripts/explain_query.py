#!/usr/bin/env python
"""Capture .explain("formatted") for registered queries → plans/$SPARK_GRAFT_PLANS_ROUND/ (default r10).

Usage: python scripts/explain_query.py <suffix> <query> [<query> ...]
Writes plans/<round>/<query>_<suffix>.txt for each query. Plans are built on
the bench session (get_spark) at $SPARK_GRAFT_SF_DIR with a cleared
artifact registry, so published-artifact queries capture the plan the
bench's cold run executes (their warm plan is a scan of the published
checkpoint — noted in the file header when it applies).
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    from spark_deal_observer_spark.operators import models
    from spark_deal_observer_spark.plans.registry import REGISTRY
    from spark_deal_observer_spark.session import get_spark

    spark = get_spark("explain")
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = REPO / "plans" / os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r10")
    out_dir.mkdir(parents=True, exist_ok=True)
    for name in names:
        models.clear()
        df = REGISTRY[name].fn(spark, SF)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        header = (
            f"-- {name} @ {SF} ({suffix})\n"
            f"-- artifact registry cleared before plan build; published-\n"
            f"-- artifact queries show the cold/training-pass plan here\n"
            f"-- (their warm bench plan scans the published checkpoint).\n"
        )
        (out_dir / f"{name}_{suffix}.txt").write_text(header + plan)
        print(f"wrote {out_dir.relative_to(REPO)}/{name}_{suffix}.txt", flush=True)


if __name__ == "__main__":
    main()
