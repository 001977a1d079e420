"""Streaming calibration monitor: per-batch bins must equal the batch
operator's bins computed directly on the same slice, the gap against the
published training baseline must be consistent arithmetic, replay must be
bit-identical, and empty ticks must write nothing."""

from __future__ import annotations

from conftest import SF_ORACLE
from pyspark.sql import functions as F

from spark_deal_observer_spark.operators.classifier import calibration_report
from spark_deal_observer_spark.sources.tables import load_table
from spark_deal_observer_spark.streaming.calibration import CalibrationMonitorSink


def _report(sink, batch_id):
    return {
        r["bin"]: r
        for r in sink.read_report().where(F.col("batch_id") == batch_id).collect()
    }


def test_batch_bins_match_direct_computation(spark, tmp_path):
    docs = load_table(spark, SF_ORACLE, "documents")
    sink = CalibrationMonitorSink(spark, docs, str(tmp_path / "cal"))
    half = docs.where(F.col("doc_id") % 2 == 0)
    sink.process_batch(half, batch_id=0)

    got = _report(sink, 0)
    want = {r["bin"]: r for r in calibration_report(half).collect()}
    assert set(got) == set(want)
    baseline = {r["bin"]: r for r in calibration_report(docs).collect()}
    for b, r in got.items():
        assert r["n"] == want[b]["n"]
        assert r["mean_prob"] == want[b]["mean_prob"]
        assert r["frac_positive"] == want[b]["frac_positive"]
        assert r["gap_vs_train"] == round(
            r["frac_positive"] - baseline[b]["frac_positive"], 6
        )


def test_replay_identical_and_empty_skipped(spark, tmp_path):
    docs = load_table(spark, SF_ORACLE, "documents")
    sink = CalibrationMonitorSink(spark, docs, str(tmp_path / "cal"))
    sink.process_batch(docs.limit(100), batch_id=0)
    before = sorted(
        tuple(r) for r in sink.read_report().drop("batch_id").collect()
    )
    sink.process_batch(docs.limit(100), batch_id=0)
    assert (
        sorted(tuple(r) for r in sink.read_report().drop("batch_id").collect())
        == before
    )
    sink.process_batch(docs.limit(0), batch_id=1)
    assert sink.read_report().where(F.col("batch_id") == 1).count() == 0
