"""Streaming keyed retry state machine (reference T5), on Spark's stateful
streaming API.

The batch formulation (operators/state.py::resolve_tick) rewrites the state
table each tick; this is the streaming-native alternative: per-deal state
lives in Spark's state store, keyed by deal id, and each micro-batch of
resolution attempts drives the transition

    NOT_QUERIED  --found-->    RESOLVED
    NOT_QUERIED  --missing-->  UNRESOLVED
    UNRESOLVED   --retry ≥3d, found-->    RESOLVED
    UNRESOLVED   --retry ≥3d, missing-->  TERMINALLY_UNRETRIEVABLE
    (retry <3d after the last attempt is ignored — the backoff clause,
     resolve-payload-cids.js:20,34; terminal/resolved states absorb)

mirroring backend/lib/resolve-payload-cids.js:32-55 and db/lib/types.js:3-10.

`transformWithStateInPandas` (Spark 4) is the newer API for this shape, but
its Python state client needs protobuf, which this environment lacks — so
the operator uses `applyInPandasWithState`, which speaks the Arrow-native
state protocol. The state row is one fixed-width tuple per deal: state
size is O(live deals), partitioned by the grouping key across executors,
checkpointed with the query — exactly the semantics the reference gets
from the active_deals table + its partial indexes.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

from ..operators.state import NOT_QUERIED, RESOLVED, TERMINAL, UNRESOLVED

if TYPE_CHECKING:
    import pandas as pd

RETRY_BACKOFF_SECONDS = 3 * 86400  # resolve-payload-cids.js:20,34

# One resolution attempt: the piece-indexer's answer for a deal at a time.
ATTEMPT_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("attempt_ts", TimestampNTZType()),
        StructField("found_payload", StringType()),  # null = provider/piece not found
    ]
)

DEAL_STATE_SCHEMA = StructType(
    [
        StructField("payload_cid", StringType()),
        StructField("payload_retrievability_state", StringType()),
        StructField("last_attempt", TimestampNTZType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("payload_cid", StringType()),
        StructField("payload_retrievability_state", StringType()),
        StructField("last_payload_retrieval_attempt", TimestampNTZType()),
    ]
)


def _transition(state: str, found: str | None) -> tuple[str | None, str]:
    """(payload_cid, next_state) for one attempt from `state`."""
    if found is not None:
        return found, RESOLVED
    if state == UNRESOLVED:
        return None, TERMINAL
    return None, UNRESOLVED


def _apply_attempts(key, pdfs: Iterator["pd.DataFrame"], group_state: GroupState):
    """Fold a micro-batch of attempts for one deal into its keyed state."""
    import pandas as pd

    if group_state.exists:
        payload, state, last = group_state.get
    else:
        payload, state, last = None, NOT_QUERIED, None

    rows = pd.concat(list(pdfs)).sort_values("attempt_ts")
    changed = False
    for r in rows.itertuples():
        if payload is not None or state in (RESOLVED, TERMINAL):
            break  # absorbing states: the reference never re-queries these
        ts = r.attempt_ts
        if last is not None and not pd.isna(last):
            elapsed = (ts - last).total_seconds()
            if state == UNRESOLVED and elapsed < RETRY_BACKOFF_SECONDS:
                continue  # backoff: too soon to retry
        found = None if (r.found_payload is None or pd.isna(r.found_payload)) else r.found_payload
        payload, state = _transition(state, found)
        last = ts
        changed = True

    if changed:
        group_state.update((payload, state, last))
        yield pd.DataFrame(
            {
                "id": pd.Series([key[0]], dtype="int64"),
                "payload_cid": [payload],
                "payload_retrievability_state": [state],
                "last_payload_retrieval_attempt": [last],
            }
        )


def resolution_state_stream(attempts: DataFrame) -> DataFrame:
    """Attempts stream → per-deal state transitions (update mode).

    Emits one row per deal per micro-batch in which its state changed; the
    downstream sink MERGEs these into the deals table (streaming/sink.py).
    """
    return attempts.groupBy("id").applyInPandasWithState(
        _apply_attempts,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=DEAL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
