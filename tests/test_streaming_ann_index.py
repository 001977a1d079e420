"""Streaming IVF-PQ index maintenance: streamed encoding must equal the
batch encode over the union of all batches (the frozen published
quantizers make encoding pointwise), replaying a delivered batch must
change nothing (overwrite-per-batch_id = effectively-once), a restarted
sink must serve everything previously ingested, and the maintained
index's ADC search must match the batch operator's answer."""

from __future__ import annotations

from conftest import SF_SMALL
from pyspark.sql import functions as F

from spark_deal_observer_spark.operators.quantization import (
    M_SUB,
    _pq_assign,
    _pq_fit,
    _subvectors,
)
from spark_deal_observer_spark.operators.similarity import _kmeans_assign, _kmeans_fit
from spark_deal_observer_spark.sources.tables import load_table
from spark_deal_observer_spark.streaming.ann_index import AnnIndexMaintenanceSink


def _splits(emb, n=2):
    return [emb.where(F.col("vec_id") % n == i) for i in range(n)]


def _index_rows(sink):
    return {
        (r["vec_id"], r["m"]): (r["cell"], r["code"])
        for r in sink.read_index().collect()
    }


def test_streamed_index_matches_batch_encode(spark, tmp_path):
    emb = load_table(spark, SF_SMALL, "embeddings")
    sink = AnnIndexMaintenanceSink(spark, emb, str(tmp_path / "idx"))
    for i, b in enumerate(_splits(emb)):
        sink.process_batch(b, batch_id=i)

    streamed = _index_rows(sink)
    vecs = emb.select("vec_id", "embedding")
    cells = {
        r["vec_id"]: r["cell"]
        for r in _kmeans_assign(vecs, sink.cents).collect()
    }
    codes = {
        (r["vec_id"], r["m"]): r["code"]
        for r in _pq_assign(_subvectors(vecs), _pq_fit(emb)).collect()
    }
    n_vecs = emb.count()
    assert len(streamed) == n_vecs * M_SUB
    for (vid, m), (cell, code) in streamed.items():
        assert cell == cells[vid]
        assert code == codes[(vid, m)]


def test_replay_is_idempotent_and_restart_recovers(spark, tmp_path):
    emb = load_table(spark, SF_SMALL, "embeddings")
    sink = AnnIndexMaintenanceSink(spark, emb, str(tmp_path / "idx"))
    batches = _splits(emb)
    for i, b in enumerate(batches):
        sink.process_batch(b, batch_id=i)
    before = _index_rows(sink)

    # at-least-once redelivery of batch 0: bit-identical overwrite
    sink.process_batch(batches[0], batch_id=0)
    assert _index_rows(sink) == before

    # a fresh sink over the same path serves the full durable index
    restarted = AnnIndexMaintenanceSink(spark, emb, str(tmp_path / "idx"))
    assert _index_rows(restarted) == before

    # empty tick writes nothing
    sink.process_batch(emb.limit(0), batch_id=9)
    assert _index_rows(sink) == before


def test_search_matches_batch_operator(spark, tmp_path):
    """ADC top-k through the MAINTAINED index equals the in-plan batch
    operator over the same corpus and published artifacts."""
    from spark_deal_observer_spark.operators.quantization import ivf_pq_topk

    emb = load_table(spark, SF_SMALL, "embeddings")
    sink = AnnIndexMaintenanceSink(spark, emb, str(tmp_path / "idx"))
    for i, b in enumerate(_splits(emb)):
        sink.process_batch(b, batch_id=i)

    query = emb.where(F.col("vec_id") == 0).select("vec_id", "embedding")
    got = [
        (r["vec_id"], r["adc_dist"])
        for r in sink.search(query, k=10).collect()
    ]
    want = [
        (r["vec_id"], r["adc_dist"])
        for r in ivf_pq_topk(emb, 0, 10).collect()
    ]
    assert got == want


def test_sink_through_structured_streaming(spark, tmp_path):
    """End-to-end through a real readStream → foreachBatch → restart: two
    parquet drops arrive as separate streaming triggers, the maintained
    index equals the direct-call result, and re-running the stream with
    the same checkpoint ingests nothing twice."""
    emb = load_table(spark, SF_SMALL, "embeddings")
    src = tmp_path / "arrivals"
    ckpt = str(tmp_path / "ckpt")
    batches = _splits(emb)
    batches[0].coalesce(1).write.mode("overwrite").parquet(str(src / "b0"))

    sink = AnnIndexMaintenanceSink(spark, emb, str(tmp_path / "idx"))
    schema = emb.schema

    def run():
        stream = spark.readStream.schema(schema).parquet(str(src / "*"))
        q = (
            stream.writeStream.foreachBatch(sink.process_batch)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()
    n0 = batches[0].count()
    assert sink.read_index().select("vec_id").distinct().count() == n0

    # second arrival: only the new file is processed on the next trigger
    batches[1].coalesce(1).write.mode("overwrite").parquet(str(src / "b1"))
    run()
    assert (
        sink.read_index().select("vec_id").distinct().count() == emb.count()
    )
    before = _index_rows(sink)

    # replaying the stream with the same checkpoint ingests nothing twice
    run()
    assert _index_rows(sink) == before


def test_drift_trigger_flags_shifted_batches(spark, tmp_path):
    """The retrain trigger: a batch drawn from the indexed distribution
    scores low drift; the shifted tail (vec_id >= 400 — the same split
    the batch twin `ann_incremental` uses) crosses the threshold and
    flags retrain_due, with the streamed statistic EXACTLY equal to the
    batch twin's (same rounded-mean + cosine arithmetic)."""
    from spark_deal_observer_spark.operators.quantization import (
        ann_incremental,
    )

    emb = load_table(spark, SF_SMALL, "embeddings")
    base = emb.where(F.col("vec_id") < 400)
    sink = AnnIndexMaintenanceSink(spark, base, str(tmp_path / "idx"))
    assert sink.read_drift().count() == 0  # pre-ingest: empty typed

    sink.process_batch(base.where(F.col("vec_id") < 200), batch_id=0)
    sink.process_batch(emb.where(F.col("vec_id") >= 400), batch_id=1)
    rows = {r["batch_id"]: r for r in sink.read_drift().collect()}
    assert rows[1]["retrain_due"] is True
    assert rows[1]["drift"] > rows[0]["drift"]
    want = ann_incremental(emb).select("drift").first()[0]
    assert rows[1]["drift"] == want
