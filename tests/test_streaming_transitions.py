"""Streaming transition monitor: with time-ordered batches the maintained
matrix must equal the batch operator over the ingested union (cross-batch
transitions included), replays must change nothing, and the per-user
last-event store must carry context without ever contributing counts."""

from __future__ import annotations

from conftest import SF_SMALL
from pyspark.sql import functions as F

from spark_deal_observer_spark.operators.sessions import event_transition_matrix
from spark_deal_observer_spark.sources.tables import load_table
from spark_deal_observer_spark.streaming.transitions import TransitionMonitorSink


def _rows(df):
    return {
        (r["prev_type"], r["next_type"]): (r["n"], r["p"]) for r in df.collect()
    }


def _time_batches(events, n=3):
    """Time-ordered tertiles (arrival order = event time, the streaming
    contract the sink documents)."""
    from pyspark.sql.window import Window

    w = Window.orderBy("ts", "event_id")
    ranked = events.withColumn("_b", F.ntile(n).over(w))
    return [ranked.where(F.col("_b") == i + 1).drop("_b") for i in range(n)]


def test_streamed_matrix_equals_batch_operator(spark, tmp_path):
    events = load_table(spark, SF_SMALL, "events")
    sink = TransitionMonitorSink(spark, str(tmp_path / "tm"))
    for i, b in enumerate(_time_batches(events)):
        sink.process_batch(b, batch_id=i)
    assert _rows(sink.read_matrix()) == _rows(event_transition_matrix(events))


def test_replay_changes_nothing(spark, tmp_path):
    events = load_table(spark, SF_SMALL, "events")
    sink = TransitionMonitorSink(spark, str(tmp_path / "tm"))
    batches = _time_batches(events)
    for i, b in enumerate(batches):
        sink.process_batch(b, batch_id=i)
    before = _rows(sink.read_matrix())
    # redeliver the middle batch: prior-snapshot reads make it bit-identical
    sink.process_batch(batches[1], batch_id=1)
    assert _rows(sink.read_matrix()) == before
    # empty tick writes nothing
    sink.process_batch(events.limit(0), batch_id=9)
    assert _rows(sink.read_matrix()) == before
