"""Perceptual ingest dedup: a re-encoded PNG (different payload bytes,
identical pixels) must be REJECTED at the door once its original is
admitted — the case exact content-hash admission cannot catch — with
the shared replay/restart semantics (strictly-below store reads)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F  # noqa: F401

from spark_deal_observer_spark.multimodal.png import encode_png
from spark_deal_observer_spark.streaming.phash_ingest import (
    PerceptualDedupIngestSink,
)
from test_multimodal_phash import _media_df, _reencode


def _images():
    w, h = 16, 16
    a = bytes((x * 7 + y * 13) % 256 for y in range(h) for x in range(w * 3))
    b = bytes(255 - v for v in a)
    png_a = encode_png(a, w, h, 3)
    return w, h, png_a, _reencode(png_a), encode_png(b, w, h, 3)


def test_reencode_rejected_exact_hash_would_admit(spark, tmp_path):
    w, h, png_a, png_a2, png_b = _images()
    sink = PerceptualDedupIngestSink(spark, str(tmp_path / "p"))
    sink.process_batch(_media_df(spark, [(png_a, w, h)]), batch_id=0)
    # batch 1: the re-encode (doc 1 again would be id 1; use fresh ids)
    b1 = spark.createDataFrame(
        [(10, bytearray(png_a2), "image/png", w, h),
         (11, bytearray(png_b), "image/png", w, h)],
        "doc_id BIGINT, payload BINARY, codec STRING, width INT, height INT",
    )
    sink.process_batch(b1, batch_id=1)
    admitted = {r["doc_id"]: r["content_md5"] for r in sink.read_admitted().collect()}
    assert set(admitted) == {1, 11}  # the re-encode (10) was rejected
    # exact-hash dedup would NOT have caught it: the payloads differ
    import hashlib

    assert hashlib.md5(png_a).hexdigest() != hashlib.md5(png_a2).hexdigest()


def test_in_batch_near_dups_collapse_to_min_id(spark, tmp_path):
    w, h, png_a, png_a2, png_b = _images()
    sink = PerceptualDedupIngestSink(spark, str(tmp_path / "p"))
    batch = _media_df(spark, [(png_a, w, h), (png_a2, w, h), (png_b, w, h)])
    sink.process_batch(batch, batch_id=0)
    assert {r["doc_id"] for r in sink.read_admitted().collect()} == {1, 3}


@pytest.mark.slow  # r10 test tier: see pytest.ini
def test_replay_is_bit_identical_and_restart_recovers(spark, tmp_path):
    w, h, png_a, png_a2, png_b = _images()
    sink = PerceptualDedupIngestSink(spark, str(tmp_path / "p"))
    sink.process_batch(_media_df(spark, [(png_a, w, h)]), batch_id=0)
    b1 = spark.createDataFrame(
        [(10, bytearray(png_b), "image/png", w, h)],
        "doc_id BIGINT, payload BINARY, codec STRING, width INT, height INT",
    )
    sink.process_batch(b1, batch_id=1)
    want = sorted(map(repr, sink.read_admitted().collect()))

    # redelivery of batch 1 (at-least-once): same prior store, same output
    sink.process_batch(b1, batch_id=1)
    assert sorted(map(repr, sink.read_admitted().collect())) == want

    # a restarted sink serves everything and keeps deduping against it
    restarted = PerceptualDedupIngestSink(spark, str(tmp_path / "p"))
    assert sorted(map(repr, restarted.read_admitted().collect())) == want
    restarted.process_batch(
        spark.createDataFrame(
            [(20, bytearray(_reencode(png_a, level=6, split=3)), "image/png", w, h)],
            "doc_id BIGINT, payload BINARY, codec STRING, width INT, height INT",
        ),
        batch_id=2,
    )
    assert {r["doc_id"] for r in restarted.read_admitted().collect()} == {1, 10}
