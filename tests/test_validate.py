"""Schema/constraint enforcement (P7/F14/F15 analog)."""

from __future__ import annotations

import pytest
from conftest import SF_SMALL

from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from spark_deal_observer_spark.functions.validate import (
    SchemaMismatch,
    deal_constraints,
    enforce_constraints,
    require_schema,
)
from spark_deal_observer_spark.plans.deals import deals_df


def test_require_schema_accepts_declared_shape(spark):
    deals = deals_df(spark, SF_SMALL)
    out = require_schema(deals, StructType(deals.schema.fields))
    assert out.columns == deals.columns


def test_require_schema_rejects_drift(spark):
    deals = deals_df(spark, SF_SMALL)
    expected = StructType(deals.schema.fields)

    with pytest.raises(SchemaMismatch, match="missing column"):
        require_schema(deals.drop("piece_cid"), expected)
    with pytest.raises(SchemaMismatch, match="expected int"):
        require_schema(deals.withColumn("miner_id", F.col("miner_id").cast("long")), expected)
    with pytest.raises(SchemaMismatch, match="unexpected columns"):
        require_schema(deals.withColumn("extra", F.lit(1)), expected)
    # opt-in tolerance for additive evolution
    require_schema(deals.withColumn("extra", F.lit(1)), expected, allow_extra=True)


def test_enforce_constraints_splits_and_names_violations(spark):
    deals = deals_df(spark, SF_SMALL)
    n = deals.count()
    valid, violations = enforce_constraints(deals, deal_constraints())
    assert valid.count() == n and violations.count() == 0

    corrupted = deals.withColumn(
        "payload_retrievability_state",
        F.when(F.col("id") % 100 == 0, F.lit("BOGUS")).otherwise(
            F.col("payload_retrievability_state")
        ),
    ).withColumn(
        "piece_size",
        F.when(F.col("id") % 100 == 0, F.lit(-1)).otherwise(F.col("piece_size")),
    )
    valid, violations = enforce_constraints(corrupted, deal_constraints())
    n_bad = corrupted.where(F.col("id") % 100 == 0).count()
    assert violations.count() == n_bad
    assert valid.count() == n - n_bad
    bad = violations.select("violated").first()["violated"]
    assert set(bad) == {"state_in_enum", "piece_size_positive"}
