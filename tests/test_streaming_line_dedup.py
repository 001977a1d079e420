"""Streaming line-dedup ingest: with batches arriving in doc_id order the
concatenated streamed output must EQUAL the batch operator over the
concatenated corpus (same global first-occurrence order), replaying a
delivered batch must be bit-identical (it reads the same PRIOR store
snapshot, never the latest), and a restarted sink resumes from durable
state."""

from __future__ import annotations

from conftest import SF_ORACLE
from pyspark.sql import functions as F

from spark_deal_observer_spark.operators.dedup import dedup_lines
from spark_deal_observer_spark.sources.tables import load_table
from spark_deal_observer_spark.streaming.line_dedup import LineDedupIngestSink


def _rows(df):
    return {
        r["doc_id"]: (r["n_lines"], r["n_kept"], r["clean_text"])
        for r in df.collect()
    }


def _batches(docs, split):
    return [
        docs.where(F.col("doc_id") < split),
        docs.where(F.col("doc_id") >= split),
    ]


def test_streamed_equals_batch_in_arrival_order(spark, tmp_path):
    docs = load_table(spark, SF_ORACLE, "documents")
    sink = LineDedupIngestSink(spark, str(tmp_path / "ld"))
    for i, b in enumerate(_batches(docs, 250)):
        sink.process_batch(b, batch_id=i)
    # doc_id-range batches make (batch, doc_id, pos) order == (doc_id, pos)
    # order, so the streamed union must equal the batch operator exactly
    assert _rows(sink.read_docs()) == _rows(dedup_lines(docs))


def test_cross_batch_lines_are_dropped(spark, tmp_path):
    docs = load_table(spark, SF_ORACLE, "documents")
    sink = LineDedupIngestSink(spark, str(tmp_path / "ld"))
    b0, b1 = _batches(docs, 250)
    sink.process_batch(b0, batch_id=0)
    sink.process_batch(b1, batch_id=1)
    streamed = _rows(sink.read_docs())
    # batch 1 docs must lose at least the lines batch 0 already claimed:
    # re-running batch 1 ALONE (fresh sink) keeps strictly more lines
    alone = LineDedupIngestSink(spark, str(tmp_path / "alone"))
    alone.process_batch(b1, batch_id=0)
    solo = _rows(alone.read_docs())
    assert sum(v[1] for v in solo.values()) > sum(
        streamed[k][1] for k in solo
    ), "cross-batch dedup removed nothing"


def test_replay_reads_prior_state_and_restart_recovers(spark, tmp_path):
    docs = load_table(spark, SF_ORACLE, "documents")
    sink = LineDedupIngestSink(spark, str(tmp_path / "ld"))
    b0, b1 = _batches(docs, 250)
    sink.process_batch(b0, batch_id=0)
    sink.process_batch(b1, batch_id=1)
    before = _rows(sink.read_docs())

    # replay batch 1: must read snapshot 0 (not 1) → bit-identical output
    sink.process_batch(b1, batch_id=1)
    assert _rows(sink.read_docs()) == before
    # replay batch 0: reads the empty prior state → bit-identical output
    sink.process_batch(b0, batch_id=0)
    assert _rows(sink.read_docs()) == before

    # a fresh sink over the same path continues from durable state: a
    # third batch containing an already-seen document keeps zero lines
    restarted = LineDedupIngestSink(spark, str(tmp_path / "ld"))
    dup = docs.where(F.col("doc_id") == 0).select(
        (F.col("doc_id") + 10_000).alias("doc_id"), "text", "lang", "source",
        "n_chars",
    )
    restarted.process_batch(dup, batch_id=2)
    rows = _rows(restarted.read_docs())
    assert rows[10_000][1] == 0 and rows[10_000][2] == ""
