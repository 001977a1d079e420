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


def published(
    source: DataFrame, name: str, params: tuple, build: Callable[[], T]
) -> T:
    """Return the published artifact for (`name`, `source`, `params`),
    training it with `build()` on first request.

    `build` must return already-checkpointed (lineage-truncated) values —
    this registry stores whatever it returns (a DataFrame or a tuple of
    them) without re-materializing.

    IMMUTABLE-SNAPSHOT ASSUMPTION: the cache key is the Catalyst semantic
    hash of `source`'s ANALYZED plan — for a file source that is the path,
    not the bytes behind it. If files under a cached path are rewritten
    within one session, lookups silently serve the artifact trained on the
    OLD snapshot; call `clear()` (or point at a new snapshot path — the
    production layout) after any in-place rewrite. Checkpointed blocks also
    die with lost executors: a cache hit whose blocks are gone fails on its
    next action rather than retraining — `clear()` and re-request to
    rebuild. Both are deliberate: keying on content or verifying block
    liveness would cost a scan per lookup, defeating the registry's point.
    """
    key = (source.sparkSession, name, _plan_key(source), params)
    got = _STORE.get(key)
    if got is None:
        got = build()
        _STORE[key] = got
        while len(_STORE) > MAX_ARTIFACTS:
            _STORE.popitem(last=False)
    else:
        _STORE.move_to_end(key)
    return got


def clear() -> None:
    """Drop every published artifact (test isolation helper)."""
    _STORE.clear()
