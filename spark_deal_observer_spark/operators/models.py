"""Session-scoped registry for trained artifacts (the in-session model store).

A production pipeline trains its models ONCE per corpus snapshot and
publishes the artifacts — the IVF coarse quantizer (K centroid rows), the
PQ codebooks (M·K rows), the near-dup cluster map (doc_id → cluster) — and
every downstream consumer reads the published artifact instead of
re-running training. Before this module, each catalog query that composed
a trained model (`kmeans_cells`, `dedup_semantic`, `ann_ivf_kmeans`,
`ann_pq_adc`, `pq_codes`, `dedup_clusters`, `dedup_canonical_pick`)
re-ran the full fixed-iteration training ladder over the corpus: N
consumers ⇒ N× the training passes. At 100 TB that is N redundant
full-corpus scans per model; the published-artifact pattern makes it one.

This registry is the in-session analog of that publish step: a memo table
keyed by

    (SparkSession, artifact name, semantic hash of the INPUT plan,
     hyperparameters)

holding the already-`localCheckpoint`'ed artifact. The semantic-hash key
means two queries training on the same logical input (same source, same
projection) share one artifact, while a different scale-factor directory,
filter, or parameter set trains its own. Correctness is unaffected:
training is deterministic (fixed seed rows, fixed iterations, per-round
ROUND pinning every mean to identical representable doubles — see
`similarity._kmeans_fit`), so the cached artifact is value-identical to a
retrain; only the redundant corpus passes disappear. The DuckDB oracle
twins never cache, so oracle parity re-proves the equivalence on every run.

Keys hold a strong reference to the SparkSession on purpose: it prevents
CPython id-reuse from aliasing a stopped session's checkpointed artifact
(whose cached blocks died with its context) into a new session.
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Any, Callable, TypeVar

from pyspark.sql import DataFrame

T = TypeVar("T")

# LRU-bounded: some artifacts are corpus-KEYED (signature tables, feature
# tables, cluster maps), so a long-lived session training over many corpus
# snapshots would otherwise accumulate checkpointed blocks without bound.
# Eviction drops the dict reference; the checkpoint's blocks are freed when
# the DataFrame's RDD is garbage-collected. 32 artifacts comfortably holds
# every model family over several scale factors.
MAX_ARTIFACTS = 32

_STORE: OrderedDict[tuple, Any] = OrderedDict()

# r9 OPTIMIZATION (guide §1.2 step 2 — per-lookup work): the liveness
# probe is an isEmpty() JOB per DataFrame per lookup (30–80 ms measured;
# a suite build does 12–13 lookups ⇒ ~1 s of probe jobs per build). A
# just-built or just-probed artifact cannot have lost its blocks in the
# same breath, so cache the verdict per entry and re-probe at most once
# per TTL. The protection semantics are kept: a long-lived session still
# detects executor-death block loss within TTL seconds, and the
# mtime/size snapshot token (not this probe) remains the freshness
# guard against rewritten inputs on every lookup.
_PROBE_TTL_S = 30.0
_PROBED: dict[tuple, float] = {}


def _plan_key(df: DataFrame) -> tuple:
    """Semantic identity of the input plan (classic-mode Catalyst hash).

    Falls back to an always-unique key (⇒ no sharing, never a wrong hit)
    if the JVM handle is unavailable (e.g. Spark Connect).
    """
    jdf = getattr(df, "_jdf", None)
    if jdf is not None:
        try:
            return ("sem", jdf.queryExecution().analyzed().semanticHash())
        except Exception:  # pragma: no cover - defensive
            pass
    return ("nocache", object())  # pragma: no cover - connect mode


def _snapshot_token(df: DataFrame) -> str:
    """Data-snapshot identity of the plan's FILE sources: a digest over
    the sorted (path, mtime_ns, size) of every input file. The semantic
    hash alone keys on the PATH — if the files behind a cached path are
    rewritten mid-session, a path-only key silently serves the artifact
    trained on the old bytes. The token is a driver-side listing + stat
    (metadata Spark already gathered to plan the scan), never a data
    scan; rewritten files change mtime/size/names, so the key rolls and
    the next request retrains. Non-file sources contribute no files and
    fall back to the plan hash (their rows ARE the plan)."""
    import hashlib
    import os
    from urllib.parse import urlparse

    try:
        files = sorted(df.inputFiles())
    except Exception:  # pragma: no cover - defensive
        return "nofiles"
    if not files:
        return "nofiles"
    h = hashlib.md5()
    for f in files:
        path = urlparse(f).path or f
        h.update(f.encode())
        try:
            st = os.stat(path)
            h.update(f":{st.st_mtime_ns}:{st.st_size};".encode())
        except OSError:  # pragma: no cover - non-local filesystem
            h.update(b";")
    return h.hexdigest()


def _alive(artifact: Any) -> bool:
    """Cheap liveness probe for a cached (checkpointed) artifact: touch
    the first partition of each DataFrame. A localCheckpoint's blocks die
    with their executors and the truncated lineage cannot recompute them
    — a dead hit must retrain, not surface 'Checkpoint block not found'
    on the consumer's next action. The probe reads one already-
    materialized in-memory block (milliseconds), not a pass; it catches
    whole-artifact loss (the executor-death / unpersist case). Partial
    block loss past the first partition can still slip through — full
    verification would cost a scan per lookup, defeating the registry."""
    parts = artifact if isinstance(artifact, (tuple, list)) else (artifact,)
    for a in parts:
        if isinstance(a, DataFrame):
            try:
                a.isEmpty()
            except Exception:
                return False
    return True


def published(
    source: DataFrame, name: str, params: tuple, build: Callable[[], T]
) -> T:
    """Return the published artifact for (`name`, `source`, `params`),
    training it with `build()` on first request.

    `build` must return already-checkpointed (lineage-truncated) values —
    this registry stores whatever it returns (a DataFrame or a tuple of
    them) without re-materializing.

    FRESHNESS: the cache key folds a data-snapshot token (file listing +
    mtimes/sizes for file sources) into the Catalyst semantic hash, so
    rewriting the files behind a cached path rolls the key and the next
    request retrains on the new bytes — no stale artifact, no manual
    `clear()`. Hits are additionally liveness-probed: checkpointed blocks
    die with lost executors and truncated lineage cannot recompute them,
    so a dead hit (probe raises) retrains in place instead of surfacing
    'Checkpoint block not found' on the consumer's next action. Both
    guards are metadata-cost only (driver-side stat + one in-memory block
    touch); neither re-scans data.
    """
    key = (
        source.sparkSession,
        name,
        _plan_key(source),
        _snapshot_token(source),
        params,
    )
    import time as _time

    got = _STORE.get(key)
    now = _time.monotonic()
    if got is not None:
        last = _PROBED.get(key)
        if last is not None and now - last < _PROBE_TTL_S:
            fresh = True
        else:
            fresh = _alive(got)
            if fresh:
                _PROBED[key] = now
        if fresh:
            _STORE.move_to_end(key)
            return got
        _release_disk(got)  # dead hit: free its parquet before rebuild
    got = build()
    _STORE[key] = got
    _PROBED[key] = _time.monotonic()  # just built — trivially alive
    _STORE.move_to_end(key)
    while len(_STORE) > MAX_ARTIFACTS:
        ek, evicted = _STORE.popitem(last=False)
        _PROBED.pop(ek, None)
        _release_disk(evicted)
    return got


def _release_disk(artifact: Any) -> None:
    """Delete the parquet directories a `disk_checkpoint`-backed artifact
    owns. Each checkpoint dir is uuid-unique and referenced by exactly one
    registry entry, so eviction (or a dead-hit rebuild) is the last
    reference — without this, LRU eviction and freshness-key rolls orphan
    corpus-sized parquet under the session's artifact dir for the whole
    process lifetime. Only paths directly under the session's
    `_sdo_artifact_dir` are touched; in-memory checkpoints have no input
    files and are untouched. (Disk mirrors the registry's LRU semantics:
    like a localCheckpoint's blocks after eviction, a consumer holding the
    evicted frame lazily must re-request through `published`.)"""
    import shutil

    parts = artifact if isinstance(artifact, (tuple, list)) else (artifact,)
    for a in parts:
        if not isinstance(a, DataFrame):
            continue
        base = getattr(a.sparkSession, "_sdo_artifact_dir", None)
        if base is None:
            continue
        try:
            files = a.inputFiles()
        except Exception:  # pragma: no cover - defensive
            continue
        import os
        from urllib.parse import urlparse

        dirs = {os.path.dirname(urlparse(f).path or f) for f in files}
        for d in dirs:
            if os.path.dirname(d) == base:
                shutil.rmtree(d, ignore_errors=True)


def disk_checkpoint(df: DataFrame, name: str) -> DataFrame:
    """Materialize `df` to PARQUET and return the read-back frame — the
    lineage-truncation for CORPUS-SIZED artifacts (signature tables,
    shingle sets, pair-intersection stores).

    `localCheckpoint` caches DESERIALIZED row objects: a hashed-shingle
    table is ~n_shingles boxed ints per document, an order of magnitude
    over its parquet footprint, and the 100× scale run OOM'd a 24 g heap
    pulling those blocks back for the probe join. Columnar parquet keeps
    the artifact at its encoded size, reads scale with executors (the
    production shape: published artifacts live in object storage, not
    executor memory), and values round-trip exactly (ints, md5 strings,
    IEEE doubles). Node-sized artifacts (centroids, codebooks, rank/label
    vectors) stay on the in-memory localCheckpoint path — for them the
    re-read would cost more than the memory saves."""
    import atexit
    import shutil
    import tempfile
    import uuid

    base = getattr(df.sparkSession, "_sdo_artifact_dir", None)
    if base is None:
        base = tempfile.mkdtemp(prefix="sdo_artifacts_")
        df.sparkSession._sdo_artifact_dir = base
        # the whole artifact tree dies with the process — per-artifact
        # dirs are additionally freed on LRU eviction (_release_disk)
        atexit.register(shutil.rmtree, base, ignore_errors=True)
    path = f"{base}/{name}_{uuid.uuid4().hex[:8]}"
    df.write.mode("overwrite").parquet(path)
    return df.sparkSession.read.parquet(path)


def clear() -> None:
    """Drop every published artifact (test isolation helper)."""
    for artifact in _STORE.values():
        _release_disk(artifact)
    _STORE.clear()
    _PROBED.clear()
