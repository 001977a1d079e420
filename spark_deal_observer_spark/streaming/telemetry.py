"""Telemetry sink (reference S11): per-loop counters as streaming metrics.

The reference pushes hand-rolled counters to InfluxDB after every loop
iteration (backend/lib/telemetry.js:10-39, recorded at
bin/deal-observer-backend.js:52-56,95-100,137-144). The Spark-native form
is the pair:

  * `df.observe(name, exprs...)` on the streaming DataFrame — arbitrary
    aggregates computed inside the running query, no extra pass (the ingest
    query registers its row count this way, streaming/ingest.py);
  * a `StreamingQueryListener` that receives each micro-batch's progress —
    input rates, batch durations, and every observed metric — and forwards
    them to whatever point store production uses.

`MetricsRecorder` keeps the points in memory (the test double and the
local default); `emit` is the injection seam where InfluxDB/StatsD would
plug in. Listener callbacks run off the query thread — recording must not
block, exactly like the reference's fire-and-forget Influx writes.
"""

from __future__ import annotations

from threading import Lock
from typing import Any, Callable

from pyspark.sql.streaming import StreamingQueryListener

Point = dict[str, Any]


class MetricsRecorder(StreamingQueryListener):
    """Collects one point per micro-batch: batch id, input rows, duration,
    and all `observe()` metrics of the query."""

    def __init__(self, emit: Callable[[Point], None] | None = None):
        self._lock = Lock()
        self.points: list[Point] = []
        self._emit = emit

    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        observed = {
            name: row.asDict() for name, row in (p.observedMetrics or {}).items()
        }
        point: Point = {
            "query": p.name,
            "batch_id": p.batchId,
            "num_input_rows": p.numInputRows,
            "duration_ms": (p.durationMs or {}).get("triggerExecution"),
            "observed": observed,
        }
        with self._lock:
            self.points.append(point)
        if self._emit is not None:
            try:
                self._emit(point)  # fire-and-forget, like the Influx writes
            except Exception:
                pass

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    def observed_total(self, query: str, metric_group: str, field: str) -> int:
        """Sum a single observed field across recorded batches."""
        with self._lock:
            return sum(
                int(pt["observed"][metric_group][field])
                for pt in self.points
                if pt["query"] == query and metric_group in pt["observed"]
            )
