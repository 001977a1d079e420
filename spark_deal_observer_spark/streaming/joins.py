"""Stream-stream event-time join: watermarked view→click attribution.

The one Structured Streaming operator family the rest of the engine's
streaming surface (windows, session windows, keyed state, dedup ingest,
sinks) does not cover: joining TWO unbounded streams. Spark buffers both
sides in state; what makes that viable forever is the pair of constraints
this module always supplies —

  * a WATERMARK on each side, bounding how late either stream can be, and
  * a TIME-RANGE predicate tying the two event times together
    (click within [view, view + horizon]),

from which Spark derives exactly when a buffered view can no longer match
any future click and evicts it. Without the range condition the state is
unbounded — the planner would accept the query and the job would die slowly
at 100 TB; this module makes the bounded form the only expressible one.

Left-outer semantics match attribution analytics: a view with no click
inside the horizon is emitted with NULLs once the watermark proves no
match can still arrive (never earlier — the join must wait out the
horizon), so downstream conversion rates see every impression exactly once.

The same definition runs unmodified in batch (`withWatermark` is a no-op
there) and is registered as catalog query `view_click_attribution` whose
DuckDB oracle is an independent interval-join derivation — the parity run
cross-checks the streaming operator's batch semantics value-for-value.

Operational notes the test suite pins (tests/test_streaming.py):
  * the join's GLOBAL watermark is the MIN of the two sides' input
    watermarks — if one side goes quiet (no clicks for an hour), NO state
    evicts and NO outer rows emit, even though the other side races ahead;
    monitor both sides' event-time progress, not just one;
  * outer NULL rows emit in the batch AFTER the watermark advances past a
    row's horizon (the watermark commits at batch end), so attribution
    reports lag one trigger behind the data that proved the non-match;
  * dropping late rows at input is BEST-EFFORT: a late click arriving
    while its view is still buffered (outer emission pending) will still
    match — the hard guarantee is only that state is bounded and closed
    attributions are never resurrected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ATTRIBUTION_HORIZON_MINUTES = 60
DEFAULT_JOIN_WATERMARK = "30 minutes"


def view_click_attribution(
    events: DataFrame,
    horizon_minutes: int = ATTRIBUTION_HORIZON_MINUTES,
    watermark: str = DEFAULT_JOIN_WATERMARK,
) -> DataFrame:
    """(view_id, user_id, view_ts, click_id, click_ts, lag_seconds): every
    'view' event left-outer joined to the same user's 'click' events that
    happen within `horizon_minutes` after it.

    One input relation is split into the two streams (the common shape
    when both live in one event log); each side carries its own watermark
    so Spark can evict buffered rows. The join keys are user equality plus
    the event-time range — an equi-join on user with a range residual, so
    the shuffle partitioning is on user_id, never a cross product."""
    views = (
        events.where(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("view_id"),
            F.col("user_id"),
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", watermark)
    )
    clicks = (
        events.where(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("click_user"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    cond = (
        (views.user_id == clicks.click_user)
        & (clicks.click_ts >= views.view_ts)
        & (clicks.click_ts <= F.expr(f"view_ts + INTERVAL {horizon_minutes} MINUTES"))
    )
    # No lag_seconds column on purpose: event times carry sub-second
    # precision, where Spark's timestamp_diff (truncating elapsed time) and
    # DuckDB's date_diff (boundary crossings) disagree — consumers derive
    # lags from the two emitted timestamps in their own dialect.
    return views.join(clicks, cond, "leftOuter").select(
        "view_id", "user_id", "view_ts", "click_id", "click_ts"
    )
