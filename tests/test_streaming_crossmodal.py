"""Streaming crossmodal-map maintenance: streamed ≡ batch, bit-exactly.

The trained map is a pure function of five abelian raw moments, so the
incrementally-maintained W must equal the batch trainer's W exactly —
not within tolerance (every moment is an exact scaled-int DECIMAL sum,
and the single rounding boundary divides the identical integers).
Replay-idempotence and restart recovery follow the house sink contract.
"""

from __future__ import annotations

import pytest

from conftest import SF_SMALL

from spark_deal_observer_spark.sources.tables import load_table
from spark_deal_observer_spark.streaming.crossmodal_maint import CrossmodalMomentSink


def _w_of(df):
    return {(r.i, r.j): r.w6 for r in df.collect()}


@pytest.mark.slow  # r10 test tier: see pytest.ini
def test_streamed_map_equals_batch(spark, tmp_path):
    from spark_deal_observer_spark.multimodal.crossmodal import crossmodal_projection

    docs = load_table(spark, SF_SMALL, "documents")
    sink = CrossmodalMomentSink(spark, str(tmp_path / "xm"))
    sink.process_batch(docs.where("doc_id % 2 = 0"), 0)
    sink.process_batch(docs.where("doc_id % 2 = 1"), 1)
    streamed = _w_of(sink.read_w())
    batch = _w_of(crossmodal_projection(docs))
    assert streamed == batch  # bit-identical, every (i, j)

    # replay of an already-applied batch must not move the state
    sink.process_batch(docs.where("doc_id % 2 = 0"), 0)
    assert _w_of(sink.read_w()) == batch

    # restart: a new sink over the same path resumes at the snapshot
    sink2 = CrossmodalMomentSink(spark, str(tmp_path / "xm"))
    assert _w_of(sink2.read_w()) == batch
    # ...and treats old ids as applied
    sink2.process_batch(docs.where("doc_id % 2 = 1"), 1)
    assert _w_of(sink2.read_w()) == batch


def test_fresh_sink_read_w_is_typed_empty(spark, tmp_path):
    """r8 ADVICE #3: read_w() before any batch must return the empty
    trained map with the real (i, j, w6) schema, not crash inside
    SnapshotStore with sid=None."""
    sink = CrossmodalMomentSink(spark, str(tmp_path / "fresh"))
    w = sink.read_w()
    assert w.columns == ["i", "j", "w6"]
    assert w.count() == 0


def test_streamed_local_maps_equal_batch(spark, tmp_path):
    """r9 (VERDICT r8 #4): the per-cell moments of the length-routed
    local maps are abelian sums too, so the streamed per-cell W must
    equal crossmodal_local_projection bit-exactly; replay and restart
    follow the same ledger contract."""
    from spark_deal_observer_spark.multimodal.crossmodal import (
        crossmodal_local_projection,
    )
    from spark_deal_observer_spark.streaming.crossmodal_maint import (
        CrossmodalLocalMomentSink,
    )

    def _lw(df):
        return {(r.cell, r.i, r.j): r.w6 for r in df.collect()}

    docs = load_table(spark, SF_SMALL, "documents")
    sink = CrossmodalLocalMomentSink(spark, str(tmp_path / "xl"))
    assert sink.read_w().columns == ["cell", "i", "j", "w6"]
    assert sink.read_w().count() == 0  # fresh sink: typed empty map
    sink.process_batch(docs.where("doc_id % 2 = 0"), 0)
    sink.process_batch(docs.where("doc_id % 2 = 1"), 1)
    batch = _lw(crossmodal_local_projection(docs))
    assert _lw(sink.read_w()) == batch  # bit-identical, every (cell, i, j)
    assert {c for c, _, _ in batch} == {0, 1, 2, 3}  # all four length cells

    sink.process_batch(docs.where("doc_id % 2 = 0"), 0)  # replay: no drift
    assert _lw(sink.read_w()) == batch
    sink2 = CrossmodalLocalMomentSink(spark, str(tmp_path / "xl"))
    assert _lw(sink2.read_w()) == batch  # restart resumes at the snapshot
