"""Streaming near-dup suppression: per-batch LSH dedup against the
accumulated signature store (streaming/dedup_ingest.py)."""

from __future__ import annotations

import pytest
from conftest import SF_SMALL

from pyspark.sql import functions as F

from spark_deal_observer_spark.sources.tables import load_table
from spark_deal_observer_spark.streaming.dedup_ingest import NearDupIngestSink


@pytest.fixture()
def sink(spark, tmp_path):
    return NearDupIngestSink(
        spark, str(tmp_path / "corpus"), str(tmp_path / "store")
    )


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id BIGINT, text STRING")


def test_in_batch_near_dups_collapse_to_min_id(spark, sink):
    base = load_table(spark, SF_SMALL, "documents").select("text").limit(3).collect()
    t0, t1, t2 = (r["text"] for r in base)
    batch = _docs(spark, [(1, t0), (2, t0), (3, t1), (4, t2)])  # 2 duplicates 1
    sink.process_batch(batch)
    admitted = {r["doc_id"] for r in sink.read_corpus().collect()}
    assert admitted == {1, 3, 4}


def test_cross_batch_near_dups_drop_against_store(spark, sink):
    base = load_table(spark, SF_SMALL, "documents").select("text").limit(4).collect()
    t0, t1, t2, t3 = (r["text"] for r in base)
    sink.process_batch(_docs(spark, [(1, t0), (2, t1)]), batch_id=0)
    # batch 2: doc 10 duplicates stored doc 1; docs 11/12 are new content
    # (distinct batch_id — it IS the replay unit under the per-batch-dir
    # store; redelivering an id overwrites that id's dirs bit-identically)
    sink.process_batch(_docs(spark, [(10, t0), (11, t2), (12, t3)]), batch_id=1)
    admitted = {r["doc_id"] for r in sink.read_corpus().collect()}
    assert admitted == {1, 2, 11, 12}


def test_replay_is_idempotent(spark, sink):
    base = load_table(spark, SF_SMALL, "documents").select("text").limit(2).collect()
    t0, t1 = (r["text"] for r in base)
    batch = _docs(spark, [(1, t0), (2, t1)])
    sink.process_batch(batch)
    n1 = sink.read_corpus().count()
    sink.process_batch(batch)  # at-least-once replay of the same batch
    assert sink.read_corpus().count() == n1
    # and the store grew only once per admitted doc's bands
    store = spark.read.parquet(sink.store_path)
    assert store.groupBy("doc_id", "band").count().where(F.col("count") > 1).count() == 0


def test_store_carries_bands_only_for_admitted_docs(spark, sink):
    base = load_table(spark, SF_SMALL, "documents").select("text").limit(2).collect()
    t0, t1 = (r["text"] for r in base)
    sink.process_batch(_docs(spark, [(5, t0), (6, t0), (7, t1)]))
    store_ids = {r["doc_id"] for r in spark.read.parquet(sink.store_path).collect()}
    assert store_ids == {5, 7}


@pytest.mark.slow  # r10 test tier: see pytest.ini
def test_streaming_wiring_end_to_end(spark, sink, tmp_path):
    """Drive the sink through a REAL Structured Streaming query: file
    source → foreachBatch(process_batch), two arrivals, near-dups across
    arrivals suppressed, checkpointed restart processes only new files."""
    base = load_table(spark, SF_SMALL, "documents").select("text").limit(3).collect()
    t0, t1, t2 = (r["text"] for r in base)
    src = tmp_path / "stream_src"
    ckpt = str(tmp_path / "ckpt")
    src.mkdir()

    def arrive(name, rows):
        _docs(spark, rows).coalesce(1).write.mode("overwrite").parquet(str(src / name))

    def run():
        stream = spark.readStream.schema("doc_id BIGINT, text STRING").parquet(
            str(src / "*")
        )
        q = (
            stream.writeStream.foreachBatch(sink.process_batch)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    arrive("a1", [(1, t0), (2, t1)])
    run()
    assert {r["doc_id"] for r in sink.read_corpus().collect()} == {1, 2}

    # second arrival: 10 duplicates stored 1; 11 is new
    arrive("a2", [(10, t0), (11, t2)])
    run()  # restart from checkpoint → only a2 is processed
    assert {r["doc_id"] for r in sink.read_corpus().collect()} == {1, 2, 11}
