"""Event-time windowed aggregation with watermark-bounded lateness.

The reference's telemetry loop emits per-tick counters (telemetry.js:10-39)
and guards ingestion with a finality lag — "only process data old enough to
be immutable" (deal-observer-backend.js:29-34). In Spark terms those are one
construct: an event-time window aggregation behind a watermark. The
watermark is the finality lag (940 epochs × 30 s for the chain source);
windows finalize exactly when they pass it, and later-arriving rows for a
finalized window are dropped — the streaming-native version of "reorgs
can't touch data past finality".

State size is O(open windows × group cardinality), independent of history —
the property that lets this run forever on an unbounded stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# 940 epochs × 30 s (deal-observer-backend.js:29-34) — callers may pass a
# shorter lag for tests.
FINALITY_WATERMARK = "28200 seconds"


def windowed_event_counts(
    events: DataFrame,
    ts_col: str = "ts",
    window: str = "10 minutes",
    watermark: str = FINALITY_WATERMARK,
) -> DataFrame:
    """Per-window, per-type event counts; append-mode (finalized windows only).

    Two-phase aggregation under the hood: map-side partial counts per
    (window, type), one shuffle of counters. The window column derives from
    the event time, so partition pruning on ingest date still applies to any
    batch replay of the same query."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
        )
    )


def session_window_stats(
    events: DataFrame,
    ts_col: str = "ts",
    key: str = "user_id",
    gap: str = "30 minutes",
    watermark: str = FINALITY_WATERMARK,
) -> DataFrame:
    """Streaming sessionization: per-key activity sessions that close after
    `gap` of inactivity, via the native `session_window` aggregation.

    This is the unbounded-stream form of the batch gaps-and-islands
    operator (`operators/sessions.py::sessionize`, the oracle-checked
    twin): the batch form needs the full history sorted per key, while
    here state is O(OPEN sessions) — Spark merges an arriving event into
    its key's open session (extending `end` to event+gap), and the session
    finalizes exactly when the watermark passes its end, after which late
    events for it are dropped rather than re-opening it. That bound is
    what lets sessionization run forever: a key's finished sessions cost
    nothing, no matter how long the stream has been up — and it is also
    the honest answer to the batch operator's documented hot-key
    degenerate case (one key's FULL event history exceeding a partition):
    the streaming form never holds more than the open session per key."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("w"), key)
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select(
            key,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )
