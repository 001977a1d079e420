"""Streaming sessionization (native session_window + watermark) agrees with
the batch gaps-and-islands twin (`sessionize_events`' operator) on every
session the stream finalizes."""

from __future__ import annotations

from conftest import SF_SMALL
from pyspark.sql import functions as F

from spark_deal_observer_spark.operators.sessions import DEFAULT_GAP_SECONDS, sessionize
from spark_deal_observer_spark.sources.tables import load_table
from spark_deal_observer_spark.streaming.ingest import EVENTS_DDL


def test_streaming_session_window_matches_batch(spark, tmp_path):
    events = load_table(spark, SF_SMALL, "events")
    src = str(tmp_path / "src")
    events.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(EVENTS_DDL).parquet(src)
    agg = (
        stream.withColumn("et", F.col("ts").cast("timestamp"))
        .withWatermark("et", "1 second")
        .groupBy(F.session_window("et", f"{DEFAULT_GAP_SECONDS} seconds"), "user_id")
        .agg(F.count("*").cast("int").alias("n_events"))
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("sessions_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    # append mode emits only watermark-finalized sessions; each one must
    # match a batch session exactly on (user, start instant, event count)
    emitted = {
        (r.user_id, r.session_window.start, r.n_events)
        for r in spark.table("sessions_stream").collect()
    }
    assert emitted, "expected at least some finalized sessions"

    batch = {
        (r.user_id, r.session_start, r.n_events)
        for r in sessionize(events).withColumn(
            "session_start", F.col("session_start").cast("timestamp")
        ).select("user_id", "session_start", "n_events").collect()
    }
    assert emitted <= batch
    assert len(emitted) >= len(batch) // 2  # most sessions finalize
