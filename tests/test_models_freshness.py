"""Artifact-registry freshness (operators/models.py): rewriting the files
behind a cached path must retrain (snapshot token in the key), a dead
cache hit whose checkpoint blocks were lost must rebuild instead of
erroring, and the guards must not cause spurious retrains on unchanged
inputs (the registry's whole point is train-once)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from spark_deal_observer_spark.operators import models


def _write(spark, path: str, values: list[int]) -> None:
    spark.createDataFrame(
        [(i, v) for i, v in enumerate(values)], "id long, v long"
    ).coalesce(1).write.mode("overwrite").parquet(path)


def _sum_artifact(src):
    """A stand-in trainer: one aggregate, checkpointed like real builds."""
    return src.agg(F.sum("v").alias("s")).localCheckpoint(eager=True)


@pytest.mark.slow  # r10 test tier: see pytest.ini
def test_changed_files_behind_same_path_retrain(spark, tmp_path):
    models.clear()
    path = str(tmp_path / "corpus")
    _write(spark, path, [1, 2, 3])
    calls = []

    def build_from(src):
        def build():
            calls.append(1)
            return _sum_artifact(src)

        return build

    src1 = spark.read.parquet(path)
    a1 = models.published(src1, "sumv", (), build_from(src1))
    assert a1.first()["s"] == 6 and len(calls) == 1

    # same PATH, new bytes: a fresh reader over the rewritten files must
    # key to a new snapshot and retrain — the old behavior served the
    # stale artifact (semantic hash covers only the path)
    _write(spark, path, [10, 20, 30, 40])
    src2 = spark.read.parquet(path)
    a2 = models.published(src2, "sumv", (), build_from(src2))
    assert len(calls) == 2, "rewritten files behind the same path must retrain"
    assert a2.first()["s"] == 100
    models.clear()


def test_unchanged_path_still_shares_one_training_run(spark, tmp_path):
    models.clear()
    path = str(tmp_path / "corpus2")
    _write(spark, path, [5, 7])
    calls = []

    def build():
        calls.append(1)
        return _sum_artifact(spark.read.parquet(path))

    a1 = models.published(spark.read.parquet(path), "sumv", (), build)
    a2 = models.published(spark.read.parquet(path), "sumv", (), build)
    assert len(calls) == 1, "unchanged files must HIT (no spurious retrain)"
    assert a1 is a2 and a2.first()["s"] == 12
    models.clear()


def test_lost_checkpoint_blocks_rebuild_instead_of_erroring(spark, tmp_path):
    models.clear()
    path = str(tmp_path / "corpus3")
    _write(spark, path, [2, 4, 8])
    calls = []
    src = spark.read.parquet(path)

    def build():
        calls.append(1)
        return _sum_artifact(src)

    a1 = models.published(src, "sumv", (), build)
    assert a1.first()["s"] == 14 and len(calls) == 1

    # simulate executor loss: wipe every persisted RDD's blocks — the
    # localCheckpoint's lineage is truncated, so the old artifact can
    # never be recomputed, only rebuilt
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    for jrdd in jmap.values():
        jrdd.unpersist(True)

    # r9: liveness verdicts are TTL-cached (models._PROBE_TTL_S; see
    # test_models_r3.py::test_probe_ttl_caches_liveness for the TTL
    # semantics themselves). This test pins the RETRAIN-NOT-CRASH
    # contract at probe time, so expire the cached verdict as a TTL
    # lapse would.
    for k in list(models._PROBED):
        models._PROBED[k] = -1e9

    a2 = models.published(src, "sumv", (), build)
    assert len(calls) == 2, "a dead hit must retrain, not serve a corpse"
    assert a2.first()["s"] == 14
    models.clear()


def test_disk_checkpoint_artifacts_freed_on_eviction_and_clear(spark, tmp_path):
    """ADVICE r5: LRU eviction / clear() must rmtree a disk_checkpoint
    artifact's parquet directories — otherwise long sessions retraining
    over many corpus snapshots grow disk without bound."""
    import os
    from urllib.parse import urlparse

    from spark_deal_observer_spark.operators import models

    def _dir(df):
        f = df.inputFiles()[0]
        return os.path.dirname(urlparse(f).path or f)

    models.clear()
    src = spark.range(10).selectExpr("id", "id * 2 AS v")

    def build(tag):
        return models.disk_checkpoint(
            src.selectExpr(f"id + {tag} AS id", "v"), f"t{tag}"
        )

    a = models.published(src, "gc_probe_a", (1,), lambda: build(1))
    dir_a = _dir(a)
    base = spark._sdo_artifact_dir
    assert os.path.dirname(dir_a) == base and os.path.isdir(dir_a)

    old_max = models.MAX_ARTIFACTS
    models.MAX_ARTIFACTS = 1
    try:
        b = models.published(src, "gc_probe_b", (2,), lambda: build(2))
        dir_b = _dir(b)
        # a was evicted (LRU bound 1) and its parquet went with it
        assert not os.path.exists(dir_a)
        assert os.path.isdir(dir_b)
        assert b.count() == 10
        models.clear()
        assert not os.path.exists(dir_b)
    finally:
        models.MAX_ARTIFACTS = old_max
