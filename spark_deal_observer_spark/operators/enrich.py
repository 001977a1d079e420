"""Executor-locally cached enrichment — the J3 cold-dimension path.

The reference's payload resolver looks up miner info over RPC behind an LRU
cache of 10,000 entries with a 1-hour TTL (resolve-payload-cids.js:162-181):
the dimension is too cold/remote to join, but keys repeat heavily within a
tick, so a per-process cache absorbs almost every call.

The Spark-native shape: `mapInPandas` whose worker keeps a module-level
TTL-LRU keyed by cache name. Python workers are reused across tasks
(`spark.python.worker.reuse`, default true), so the cache lives as long as
the executor — calls hit the external service once per (key, TTL window)
per worker, not once per row. This complements the broadcast-join path
(plans/registry.py `dim_lookup_join`) which is right for WARM dimensions
that fit in memory; use this one when the dimension is an external service.

Every output row carries `cache_hit` so call amplification is observable in
the pipeline itself (and asserted in tests/test_enrich.py).
"""

from __future__ import annotations

import time
from collections import OrderedDict
from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame

DEFAULT_MAXSIZE = 10_000  # reference LRU size
DEFAULT_TTL = 3600.0  # reference maxAge: 1 hour


def stub_peer_service(miner_id) -> str:
    """Deterministic stand-in for the reference's StateMinerInfo RPC
    (resolve-payload-cids.js:145-154). Module-level so executor tasks can
    unpickle it by reference."""
    return f"peer-{miner_id}"


class TTLCache:
    """LRU with per-entry TTL (insertion-time based, like the reference's
    lru-cache `maxAge`). O(1) get/put via OrderedDict."""

    def __init__(
        self,
        maxsize: int = DEFAULT_MAXSIZE,
        ttl: float = DEFAULT_TTL,
        clock: Callable[[], float] = time.monotonic,
    ):
        self.maxsize = maxsize
        self.ttl = ttl
        self.clock = clock
        self._data: OrderedDict[Any, tuple[float, Any]] = OrderedDict()

    _MISS = object()

    def get(self, key: Any) -> Any:
        hit = self._data.get(key)
        if hit is None:
            return self._MISS
        stamp, value = hit
        if self.clock() - stamp > self.ttl:
            del self._data[key]
            return self._MISS
        self._data.move_to_end(key)
        return value

    def put(self, key: Any, value: Any) -> None:
        self._data[key] = (self.clock(), value)
        self._data.move_to_end(key)
        while len(self._data) > self.maxsize:
            self._data.popitem(last=False)


# Per-worker-process cache pool: survives across tasks because Spark reuses
# Python workers. Keyed by cache name so unrelated enrichments don't collide.
_WORKER_CACHES: dict[str, TTLCache] = {}


def worker_cache(name: str, maxsize: int, ttl: float) -> TTLCache:
    cache = _WORKER_CACHES.get(name)
    if cache is None:
        cache = _WORKER_CACHES[name] = TTLCache(maxsize, ttl)
    return cache


def cached_enrich(
    df: DataFrame,
    key_col: str,
    service: Callable[[Any], str],
    value_col: str = "enriched",
    cache_name: str = "enrich",
    maxsize: int = DEFAULT_MAXSIZE,
    ttl: float = DEFAULT_TTL,
) -> DataFrame:
    """Append `value_col` = service(key) and `cache_hit`, caching per worker.

    `service` must be picklable and safe to call from N workers concurrently
    (wrap it in `streaming.transport.with_retries` for the S3 retry budget).
    Arrow-batched; the only Python rows are the enrichment's own columns.
    """
    from pyspark.sql.types import BooleanType, StringType, StructField, StructType

    # fresh StructType: .add() would mutate the DataFrame's cached schema
    out_schema = StructType(
        list(df.schema.fields)
        + [StructField(value_col, StringType()), StructField("cache_hit", BooleanType())]
    )

    def enrich_partition(batches):
        cache = worker_cache(cache_name, maxsize, ttl)
        for pdf in batches:
            values: list[str] = []
            hits: list[bool] = []
            for key in pdf[key_col]:
                cached = cache.get(key)
                if cached is TTLCache._MISS:
                    cached = service(key)
                    cache.put(key, cached)
                    hits.append(False)
                else:
                    hits.append(True)
                values.append(cached)
            pdf = pdf.copy()
            pdf[value_col] = values
            pdf["cache_hit"] = hits
            yield pdf

    return df.mapInPandas(enrich_partition, out_schema)
