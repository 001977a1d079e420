"""Replicates the driver's correctness gate: every registered query vs its
DuckDB oracle at sf0.01 (row count + columns + exact values)."""

from __future__ import annotations

import pytest
from conftest import SF_ORACLE

from spark_deal_observer_spark.plans.oracle_check import compare_query
from spark_deal_observer_spark.plans.registry import REGISTRY


@pytest.mark.parametrize("name", list(REGISTRY))
def test_query_matches_oracle(spark, name):
    qd = REGISTRY[name]
    if qd.oracle is None:
        df = qd.fn(spark, SF_ORACLE)
        assert df.count() >= 0  # rows-only check, mirroring the driver
        return
    ok, msg = compare_query(spark, SF_ORACLE, qd.fn, qd.oracle)
    assert ok, f"{name}: {msg}"
