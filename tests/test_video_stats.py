"""r9 optimization pins: the published per-frame stats fold is bit-equal
to the direct GIF-decode kernels it replaces on the registered video
queries (guide §2.4 — one decode pass shared by every consumer).

Corpus includes the container-variant third (doc_id % 3 == 0 carries an
injected application extension), frame-count extremes (min 2, max 12) and
stride boundaries (nf < target, nf == target, nf > target)."""

from __future__ import annotations

import pytest

from spark_deal_observer_spark.multimodal.media import (
    VIDEO_CHARS_PER_FRAME,
    VIDEO_MAX_FRAMES,
    attach_video,
    extract_video_features,
    extract_video_features_from_stats,
    video_frame_sample,
    video_frame_sample_from_stats,
    video_frame_stats_kernel,
)


@pytest.fixture(scope="module")
def spark():
    from spark_deal_observer_spark.session import get_spark

    return get_spark("test-video-stats")


TEXTS = [
    "a",  # min frames (2)
    "b" * (VIDEO_CHARS_PER_FRAME * 3),  # 3 frames: nf < sample target
    "c" * (VIDEO_CHARS_PER_FRAME * 4 + 7),  # 4 frames == target (stride 1)
    "mixed content 123 " * 6,  # mid-range, non-uniform pixels
    "d" * (VIDEO_CHARS_PER_FRAME * (VIDEO_MAX_FRAMES + 5)),  # capped at 12
    "The quick brown fox jumps over the lazy dog. " * 5,
]


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, t, len(t)) for i, t in enumerate(TEXTS)]
    return spark.createDataFrame(rows, "doc_id long, text string, n_chars int")


@pytest.fixture(scope="module")
def stats(docs):
    # the raw kernel (unpublished) — exactly what the published builder
    # checkpoints; using it directly keeps the test registry-independent
    return video_frame_stats_kernel(attach_video(docs)).localCheckpoint()


def _sorted(df):
    return sorted((tuple(r) for r in df.collect()), key=repr)


def test_features_from_stats_equals_kernel(docs, stats):
    via_stats = _sorted(extract_video_features_from_stats(stats))
    direct = _sorted(extract_video_features(attach_video(docs)))
    assert via_stats == direct


def test_frame_sample_from_stats_equals_kernel(docs, stats):
    via_stats = _sorted(video_frame_sample_from_stats(stats))
    direct = _sorted(video_frame_sample(attach_video(docs)))
    assert via_stats == direct


def test_registered_video_queries_share_one_artifact(spark, tmp_path):
    """Both registered queries must resolve to the SAME published stats
    table (one decode per registry generation, not one per consumer)."""
    import pandas as pd

    from spark_deal_observer_spark.operators import models
    from spark_deal_observer_spark.plans.registry import REGISTRY

    df = pd.DataFrame(
        {"doc_id": range(4), "text": TEXTS[:4], "n_chars": [len(t) for t in TEXTS[:4]]}
    )
    sf_dir = str(tmp_path)
    df.to_parquet(tmp_path / "documents.parquet")
    models.clear()
    before = len(models._STORE)
    REGISTRY["multimodal_video_features"].fn(spark, sf_dir).collect()
    mid = len(models._STORE)
    REGISTRY["multimodal_video_frames"].fn(spark, sf_dir).collect()
    after = len(models._STORE)
    assert mid == before + 1  # one stats artifact published
    assert after == mid  # second consumer reused it
    models.clear()
