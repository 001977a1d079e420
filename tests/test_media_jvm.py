"""r9 optimization pins: the JVM fake-codec media builders are bit-equal
to the Arrow mapInPandas kernels they replace on the registered queries'
warm AND cold paths (guide §4.1 — built-ins over Python where they exist).

The kernels (media.extract_features / resize_media / sample_frames) remain
the REAL-codec path, exercised by test_png/test_wav/test_gif; these tests
prove the registered fake-codec queries did not change value by moving to
codegen'd expressions — including the byte-semantics edges (empty text,
non-ASCII first byte, short tail frame).
"""

from __future__ import annotations

import pytest
from pyspark.sql import SparkSession

from spark_deal_observer_spark.multimodal.media import (
    attach_media,
    extract_features,
    media_features_fake_jvm,
    media_frames_fake_jvm,
    media_resize_fake_jvm,
    resize_media,
    sample_frames,
)


@pytest.fixture(scope="module")
def spark():
    from spark_deal_observer_spark.session import get_spark

    return get_spark("test-media-jvm")


TEXTS = [
    "",  # empty: features -1 first byte; frames emit no rows
    "a",  # single byte, short frame
    "x" * 63,  # one byte under a frame boundary
    "y" * 64,  # exactly one frame
    "z" * 65,  # short tail frame
    "hello world " * 40,  # several frames, every_k skipping
    "éclair pastry",  # non-ASCII lead: first BYTE != code point
    "m" * 300,  # resize truncation boundary (> 256)
]


@pytest.fixture(scope="module")
def docs(spark: SparkSession):
    rows = [(i, t, len(t)) for i, t in enumerate(TEXTS)]
    return spark.createDataFrame(rows, "doc_id long, text string, n_chars int")


def _sorted(df):
    return sorted((tuple(r) for r in df.collect()), key=repr)


def test_features_jvm_equals_kernel(docs):
    jvm = _sorted(media_features_fake_jvm(docs))
    kern = _sorted(extract_features(attach_media(docs)))
    assert jvm == kern


def test_resize_jvm_equals_kernel(docs):
    cols = ["doc_id", "num_bytes", "content_md5"]
    jvm = _sorted(media_resize_fake_jvm(docs, 256).select(*cols))
    kern = _sorted(resize_media(attach_media(docs), 256).select(*cols))
    assert jvm == kern
    # payload bytes too (the registered query drops them, the contract not)
    jp = _sorted(media_resize_fake_jvm(docs, 256).select("doc_id", "payload"))
    kp = _sorted(resize_media(attach_media(docs), 256).select("doc_id", "payload"))
    assert [(d, bytes(p)) for d, p in jp] == [(d, bytes(p)) for d, p in kp]


def test_frames_jvm_equals_kernel(docs):
    jvm = _sorted(media_frames_fake_jvm(docs, frame_bytes=64, every_k=4))
    kern = _sorted(sample_frames(attach_media(docs), frame_bytes=64, every_k=4))
    assert jvm == kern


def test_frames_jvm_equals_kernel_other_geometry(docs):
    jvm = _sorted(media_frames_fake_jvm(docs, frame_bytes=16, every_k=2))
    kern = _sorted(sample_frames(attach_media(docs), frame_bytes=16, every_k=2))
    assert jvm == kern


def test_jvm_plans_have_no_python(docs):
    for df in (
        media_features_fake_jvm(docs),
        media_resize_fake_jvm(docs, 256),
        media_frames_fake_jvm(docs),
    ):
        p = df._jdf.queryExecution().executedPlan().toString()
        for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
            assert marker not in p, p
