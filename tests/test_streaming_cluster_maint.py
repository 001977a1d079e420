"""Streaming cluster maintenance (streaming/cluster_maint.py): streamed
supernode-contraction folds must equal the batch connected-components
operator over the union of all batches, replays must be bit-identical,
and cross-batch merges must relabel prior components."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow  # r10 test tier: see pytest.ini
from conftest import SF_SMALL

from spark_deal_observer_spark.operators import dedup as dd
from spark_deal_observer_spark.sources.tables import load_table
from spark_deal_observer_spark.streaming.cluster_maint import ClusterMaintSink

SCHEMA = "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"


@pytest.fixture()
def sink(spark, tmp_path):
    return ClusterMaintSink(spark, str(tmp_path / "bands"), str(tmp_path / "labels"))


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", "unit", len(t)) for i, t in rows], SCHEMA
    )


def _labels(sink):
    return {r.doc_id: r.cluster for r in sink.read_labels().collect()}


def test_read_before_first_batch_is_empty_typed(spark, sink):
    df = sink.read_labels()
    assert df.count() == 0
    assert set(df.columns) == {"doc_id", "cluster"}


def test_streamed_fold_equals_batch_operator(spark, sink):
    """Three micro-batches of the real corpus; the final label map must
    equal connected_components over the full union — the accumulated
    star-edge union has the final full-bucket connectivity."""
    docs = load_table(spark, SF_SMALL, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    parts = [
        docs.where(f"doc_id % 3 = {k}").localCheckpoint(eager=True)
        for k in range(3)
    ]
    for i, p in enumerate(parts):
        sink.process_batch(p, batch_id=i)
    batch_labels = {
        r.doc_id: r.cluster
        for r in dd.connected_components(dd.minhash_lsh_star_edges(docs)).collect()
    }
    assert _labels(sink) == batch_labels


def test_batch_doc_bridges_two_prior_components(spark, sink):
    """A later batch doc whose bands collide with BOTH prior components
    must merge them under the global min label. A half-and-half mix sits
    at Jaccard ≈ 0.5 per side where the 4×2 banding fires only with
    probability ~0.7, so the bridge is SEARCHED deterministically: one
    band_keys pass over salted candidates picks the first that provably
    shares a band with each side — the test exercises the merge path,
    not LSH luck."""
    from spark_deal_observer_spark.streaming.cluster_maint import band_keys

    a = "alpha bravo charlie delta echo foxtrot golf hotel india " * 4
    n_cand = 24
    # same shingle-set SIZE as `a` (9 words × 4 repeats) so the union's
    # row minima split ~evenly between the two sides — a larger side
    # would own every min and the bridge would band only with it
    bs = [
        (" ".join(f"tok{k}x{i}" for i in range(9)) + " ") * 4
        for k in range(n_cand)
    ]
    bridges = [a + " " + bs[k] for k in range(n_cand)]
    rows = [(0, a)]
    rows += [(100 + k, bs[k]) for k in range(n_cand)]
    rows += [(200 + k, bridges[k]) for k in range(n_cand)]
    bands: dict[int, set] = {}
    for r in band_keys(_docs(spark, rows)).collect():
        bands.setdefault(r.doc_id, set()).add((r.band, r.key))
    k = next(
        k
        for k in range(n_cand)
        if bands[200 + k] & bands[0] and bands[200 + k] & bands[100 + k]
    )
    b, bridge = bs[k], bridges[k]
    sink.process_batch(_docs(spark, [(1, a), (11, a)]), batch_id=0)
    sink.process_batch(_docs(spark, [(3, b), (13, b)]), batch_id=1)
    l1 = _labels(sink)
    assert l1 == {1: 1, 11: 1, 3: 3, 13: 3}  # two components
    sink.process_batch(_docs(spark, [(20, bridge)]), batch_id=2)
    l2 = _labels(sink)
    # the bridge shares a band with both sides → one component, min id 1
    assert l2[1] == l2[11] == l2[3] == l2[13] == l2[20] == 1


def test_replay_is_bit_identical(spark, sink):
    docs = load_table(spark, SF_SMALL, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    b0 = docs.where("doc_id % 2 = 0").localCheckpoint(eager=True)
    b1 = docs.where("doc_id % 2 = 1").localCheckpoint(eager=True)
    sink.process_batch(b0, batch_id=0)
    sink.process_batch(b1, batch_id=1)
    before = _labels(sink)
    sink.process_batch(b1, batch_id=1)  # at-least-once redelivery
    assert _labels(sink) == before


def test_label_snapshot_gc_bounds_disk(spark, tmp_path):
    sink = ClusterMaintSink(
        spark,
        str(tmp_path / "bands"),
        str(tmp_path / "labels"),
        keep_snapshots=2,
    )
    a = "alpha bravo charlie delta echo foxtrot golf hotel india " * 4
    for i in range(5):
        sink.process_batch(_docs(spark, [(10 * i + 1, a), (10 * i + 2, a)]), batch_id=i)
    assert len(sink._labels.ids()) == 2
    # band dirs are the probe corpus — never GC'd
    assert len(sink._bands.ids()) == 5
    assert _labels(sink)[41] == 1  # all copies of `a` share one cluster


def test_crash_between_labels_and_bands_heals_on_redelivery(spark, tmp_path):
    """Torn-state chaos: a crash AFTER the labels snapshot commits but
    BEFORE the bands dir lands leaves batch N half-written (the tick's
    two writes are ordered labels-then-bands). Simulated by running the
    tick and deleting its bands dir. On redelivery the strictly-below
    reads reproduce the same inputs, both dirs overwrite bit-identically,
    and the final state equals the crash-free run."""
    import shutil

    a = "alpha bravo charlie delta echo foxtrot golf hotel india " * 4
    b0 = _docs(spark, [(1, a), (11, a)])
    b1 = _docs(spark, [(21, a), (22, a + " coda")])

    clean = ClusterMaintSink(spark, str(tmp_path / "cb"), str(tmp_path / "cl"))
    clean.process_batch(b0, batch_id=0)
    clean.process_batch(b1, batch_id=1)
    want = {r.doc_id: r.cluster for r in clean.read_labels().collect()}

    crashy = ClusterMaintSink(spark, str(tmp_path / "xb"), str(tmp_path / "xl"))
    crashy.process_batch(b0, batch_id=0)
    crashy.process_batch(b1, batch_id=1)
    shutil.rmtree(crashy._bands.path(1), ignore_errors=True)  # the torn window
    assert 1 in crashy._labels.ids() and 1 not in crashy._bands.ids()
    # Structured Streaming redelivers batch 1 (its foreachBatch never
    # returned); the redelivery overwrites both dirs
    crashy.process_batch(b1, batch_id=1)
    got = {r.doc_id: r.cluster for r in crashy.read_labels().collect()}
    assert got == want
    assert set(crashy._bands.ids()) == {0, 1}
