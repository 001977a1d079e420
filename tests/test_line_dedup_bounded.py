"""Bounded-state streaming line dedup (BoundedLineDedupIngestSink): the
TTL tier must (1) pin state — store rows bounded by the window's distinct
lines and snapshot dirs bounded by the GC horizon, while the exact sink's
state grows with every batch; (2) dedup in-window duplicates EXACTLY like
the exact sink (recall 1.0 inside the window; equality when ttl covers
the stream); (3) keep cross-window recurrences (the measured, documented
recall trade — never a false drop); (4) stay bit-identical under
same-batch-id replay (max-merge + strictly-below reads)."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow  # r10 test tier: see pytest.ini

import os

from pyspark.sql import functions as F

from spark_deal_observer_spark.operators.dedup import LINE_W
from spark_deal_observer_spark.streaming.line_dedup import (
    BoundedLineDedupIngestSink,
    LineDedupIngestSink,
)


def _line(tag: str) -> str:
    """One dedup 'line': LINE_W copies of a marker token — distinct tags
    give distinct lines, same tag gives an exact duplicate line."""
    return " ".join([tag] * LINE_W)


def _doc(doc_id: int, tags: list[str]):
    return (doc_id, " ".join(_line(t) for t in tags))


def _batch(spark, docs):
    return spark.createDataFrame(docs, "doc_id long, text string")


def _snap_ids(store: str) -> list[int]:
    if not os.path.isdir(store):
        return []
    return sorted(
        int(d.split("=", 1)[1])
        for d in os.listdir(store)
        if d.startswith("snapshot=")
    )


def _docs_rows(sink):
    return {
        r["doc_id"]: (r["n_lines"], r["n_kept"], r["clean_text"])
        for r in sink.read_docs().collect()
    }


def _stream(spark, n_batches=12, fresh_per_batch=4):
    """Batch i: `fresh_per_batch` new lines + 1 repeat from batch i-1
    (in-window at any ttl >= 1) + 1 repeat from batch i-6 (out-of-window
    at ttl=3). Distinct-ever grows linearly; any 4-batch window holds at
    most ~6*fresh lines."""
    batches = []
    for i in range(n_batches):
        fresh = [f"b{i}n{j}" for j in range(fresh_per_batch)]
        tags = list(fresh)
        if i >= 1:
            tags.append(f"b{i - 1}n0")  # lag-1 duplicate: always in-window
        if i >= 6:
            tags.append(f"b{i - 6}n1")  # lag-6 duplicate: outside ttl=3
        batches.append([_doc(i * 10 + k, [t]) for k, t in enumerate(tags)])
    return [_batch(spark, b) for b in batches]


def test_state_is_bounded_while_exact_grows(spark, tmp_path):
    batches = _stream(spark)
    exact = LineDedupIngestSink(spark, str(tmp_path / "exact"))
    bounded = BoundedLineDedupIngestSink(
        spark, str(tmp_path / "bounded"), ttl_batches=3, keep_snapshots=3
    )
    exact_sizes, bounded_sizes = [], []
    for i, b in enumerate(batches):
        exact.process_batch(b, batch_id=i)
        bounded.process_batch(b, batch_id=i)
        exact_sizes.append(
            spark.read.parquet(f"{exact.store}/snapshot={i}").count()
        )
        bounded_sizes.append(
            spark.read.parquet(f"{bounded.store}/snapshot={i}").count()
        )

    # exact: one row per distinct line ever -> strictly monotone growth
    assert exact_sizes == sorted(exact_sizes) and exact_sizes[-1] > 40
    # bounded: plateaus at the window's distinct-line capacity
    window_cap = max(bounded_sizes)
    assert window_cap <= 30, bounded_sizes
    assert bounded_sizes[-1] <= window_cap < exact_sizes[-1]

    # GC: the bounded store holds only the newest `keep` snapshot dirs,
    # the exact store one per batch
    assert len(_snap_ids(exact.store)) == len(batches)
    assert _snap_ids(bounded.store) == [9, 10, 11]


def test_in_window_duplicates_dedup_identically(spark, tmp_path):
    """ttl covering the whole stream => bounded output == exact output,
    byte for byte (the TTL tier's only divergence is out-of-window)."""
    batches = _stream(spark, n_batches=8)
    exact = LineDedupIngestSink(spark, str(tmp_path / "e2"))
    bounded = BoundedLineDedupIngestSink(
        spark, str(tmp_path / "b2"), ttl_batches=100
    )
    for i, b in enumerate(batches):
        exact.process_batch(b, batch_id=i)
        bounded.process_batch(b, batch_id=i)
    assert _docs_rows(bounded) == _docs_rows(exact)


def test_cross_window_recurrence_kept_and_recall_quantified(spark, tmp_path):
    """The measured recall trade: lag-1 duplicates are all caught (same
    as exact); lag-6 duplicates survive at ttl=3 (first-seen again). The
    bounded sink must never drop MORE than exact (no false drops)."""
    batches = _stream(spark)
    exact = LineDedupIngestSink(spark, str(tmp_path / "e3"))
    bounded = BoundedLineDedupIngestSink(
        spark, str(tmp_path / "b3"), ttl_batches=3
    )
    for i, b in enumerate(batches):
        exact.process_batch(b, batch_id=i)
        bounded.process_batch(b, batch_id=i)
    e_rows, b_rows = _docs_rows(exact), _docs_rows(bounded)
    assert set(e_rows) == set(b_rows)

    dropped_exact = sum(n - k for (n, k, _) in e_rows.values())
    dropped_bounded = sum(n - k for (n, k, _) in b_rows.values())
    # stream shape: 11 lag-1 duplicates (batches 1..11), 6 lag-6
    # duplicates (batches 6..11); ttl=3 catches every lag-1, misses
    # every lag-6 => recall = 11/17 exactly, and never a false drop
    assert dropped_exact == 17
    assert dropped_bounded == 11
    for d in e_rows:
        assert b_rows[d][1] >= e_rows[d][1], d  # bounded keeps >= exact

    # the lag-6 recurrence docs: exact drops the line, bounded keeps it
    lag6_docs = [i * 10 + 5 for i in range(6, 12)]  # 6th doc of batches 6+
    for d in lag6_docs:
        assert e_rows[d][1] == 0 and b_rows[d][1] == 1, d


def test_streamed_bounded_union_equals_batch_ttl_operator(spark, tmp_path):
    """doc_id-ordered ingestion through the bounded sink must equal the
    ORACLE-CHECKED batch operator `dedup_lines_ttl` over the concatenated
    corpus (batch = doc_id DIV batch_docs, matching ttl) — the same
    streamed≡batch pin the exact sink has, extended to the TTL tier, so
    the streaming recall trade is exactly the one the DuckDB oracle
    verifies."""
    from conftest import SF_SMALL

    from spark_deal_observer_spark.operators.dedup import dedup_lines_ttl
    from spark_deal_observer_spark.sources.tables import load_table

    docs = load_table(spark, SF_SMALL, "documents")
    max_id = docs.agg(F.max("doc_id")).first()[0]
    bdocs = max(1, (max_id + 1) // 8)
    ttl = 2
    sink = BoundedLineDedupIngestSink(
        spark, str(tmp_path / "tw"), ttl_batches=ttl
    )
    n_batches = max_id // bdocs + 1
    for i in range(n_batches):
        sink.process_batch(
            docs.where(F.expr(f"doc_id DIV {bdocs}") == i), batch_id=i
        )
    got = {
        r["doc_id"]: (r["n_lines"], r["n_kept"], r["clean_text"])
        for r in sink.read_docs().collect()
    }
    want = {
        r["doc_id"]: (r["n_lines"], r["n_kept"], r["clean_text"])
        for r in dedup_lines_ttl(docs, ttl_batches=ttl, batch_docs=bdocs).collect()
    }
    assert got == want


def test_bounded_replay_is_bit_identical(spark, tmp_path):
    batches = _stream(spark, n_batches=6)
    sink = BoundedLineDedupIngestSink(
        spark, str(tmp_path / "b4"), ttl_batches=3
    )
    for i, b in enumerate(batches):
        sink.process_batch(b, batch_id=i)
    before_docs = _docs_rows(sink)
    before_store = {
        r["lh"]: r["last_seen"]
        for r in spark.read.parquet(f"{sink.store}/snapshot=5").collect()
    }
    # at-least-once: redeliver the final batch under the SAME id
    sink.process_batch(batches[5], batch_id=5)
    assert _docs_rows(sink) == before_docs
    after_store = {
        r["lh"]: r["last_seen"]
        for r in spark.read.parquet(f"{sink.store}/snapshot=5").collect()
    }
    assert after_store == before_store
