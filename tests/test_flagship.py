from __future__ import annotations

from conftest import SF_ORACLE, SF_SMALL

from spark_deal_observer_spark.plans.deals import (
    ELIGIBLE_DEALS_ORACLE_BODY,
    deals_df,
    eligible_deals,
    oracle_with_deals,
)
from spark_deal_observer_spark.plans.oracle_check import compare_query


def test_deals_view_nonempty(spark):
    df = deals_df(spark, SF_SMALL)
    assert df.count() > 0
    assert "payload_retrievability_state" in df.columns


def test_flagship_matches_oracle(spark):
    ok, msg = compare_query(
        spark,
        SF_ORACLE,
        lambda s, sf: eligible_deals(deals_df(s, sf)),
        oracle_with_deals(ELIGIBLE_DEALS_ORACLE_BODY),
    )
    assert ok, msg
