"""Driver contract for the spark-graft builder (PySpark target).

Backed by the `spark_deal_observer_spark` package: a PySpark-native rebuild
of CheckerNetwork/spark-deal-observer's query surface (see SURVEY.md §2 and
spark_deal_observer_spark/plans/registry.py for the operator catalog).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from spark_deal_observer_spark.plans import registry as _registry
from spark_deal_observer_spark.plans.deals import deals_df, eligible_deals


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Egress eligibility (reference spark-api-submit-deals.js:51-81): derive the
    deal state table from the events stream, filter to submittable deals,
    project the egress payload with computed expiry.
    """
    return eligible_deals(deals_df(spark, "/root/testdata/sf0.001"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each query (keys match queries())."""
    return _registry.oracle_sql()
