"""JSON/CSV ingestion (typed-scan boundary P7 over semi-structured files):
schema enforcement, round-trip equivalence with parquet, quarantine."""

from __future__ import annotations

import pytest
from conftest import SF_SMALL
from pyspark.sql import functions as F

from spark_deal_observer_spark.sources.formats import (
    TS_FMT,
    read_events_csv,
    read_events_json,
    split_quarantine,
)
from spark_deal_observer_spark.sources.tables import load_table


@pytest.fixture()
def events(spark):
    return load_table(spark, SF_SMALL, "events")


def _fingerprint(df):
    # order-free content hash over the canonical columns
    return (
        df.select(F.md5(F.to_json(F.struct("event_id", "ts", "user_id", "event_type", "value"))).alias("h"))
        .agg(F.sum(F.conv(F.substring("h", 1, 8), 16, 10).cast("decimal(38,0)")).alias("s"))
        .collect()[0]["s"]
    )


def test_json_roundtrip_matches_parquet(spark, events, tmp_path):
    path = str(tmp_path / "events_json")
    events.drop("props").write.mode("overwrite").option("timestampNTZFormat", TS_FMT).json(path)
    back = read_events_json(spark, path, mode="strict").drop("props")
    assert back.count() == events.count()
    assert _fingerprint(back) == _fingerprint(events)


def test_csv_roundtrip_matches_parquet(spark, events, tmp_path):
    path = str(tmp_path / "events_csv")
    (
        events.drop("props")
        .write.mode("overwrite")
        .option("header", "true")
        .option("timestampNTZFormat", TS_FMT)
        .csv(path)
    )
    back = read_events_csv(spark, path, mode="strict").drop("props")
    assert back.count() == events.count()
    assert _fingerprint(back) == _fingerprint(events)


def test_quarantine_separates_bad_rows(spark, tmp_path):
    path = tmp_path / "mixed.json"
    path.write_text(
        '{"event_id": 1, "ts": "2025-01-01 00:00:00.000000", "user_id": 7, '
        '"event_type": "purchase", "value": 1.5, "props": "{}"}\n'
        '{"event_id": "NOT A NUMBER", "ts": "garbage"}\n'
        "this is not json at all\n"
        '{"event_id": 2, "ts": "2025-01-02 00:00:00.000000", "user_id": 8, '
        '"event_type": "view", "value": 2.5, "props": "{}"}\n'
    )
    df = read_events_json(spark, str(path), mode="quarantine")
    clean, bad = split_quarantine(df)
    assert clean.count() == 2
    assert {r.event_id for r in clean.collect()} == {1, 2}
    assert bad.count() == 2
    assert any("NOT A NUMBER" in r.raw for r in bad.collect())


def test_strict_mode_fails_fast(spark, tmp_path):
    path = tmp_path / "bad.json"
    path.write_text('{"event_id": "boom"}\n')
    with pytest.raises(Exception, match="FAILFAST|Malformed|malformed"):
        read_events_json(spark, str(path), mode="strict").collect()


def test_clean_rows_feed_existing_pipeline(spark, events, tmp_path):
    """Format-agnostic downstream: the JSON-read events produce the same
    deal derivation as the parquet source."""
    path = str(tmp_path / "events_json")
    events.write.mode("overwrite").option("timestampNTZFormat", TS_FMT).json(path)
    from spark_deal_observer_spark.plans.deals import DEAL_SELECT_EXPRS

    via_json = read_events_json(spark, path, mode="strict").selectExpr(*DEAL_SELECT_EXPRS)
    via_parquet = events.selectExpr(*DEAL_SELECT_EXPRS)
    assert via_json.exceptAll(via_parquet).count() == 0
    assert via_parquet.exceptAll(via_json).count() == 0
