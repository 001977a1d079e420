"""The whole system, one table: the reference's three concurrent loops
(ingest → enrichment state machine → egress) run against a single deal
table, asserting the cross-loop invariants the reference's architecture
guarantees (deal-observer-backend.js:165-173)."""

from __future__ import annotations

import pytest

from conftest import SF_SMALL

from pyspark.sql import functions as F

from spark_deal_observer_spark.operators.state import (
    NOT_QUERIED,
    RESOLVED,
    TERMINAL,
    UNRESOLVED,
    resolve_tick,
)
from spark_deal_observer_spark.plans.deals import REF_TS
from spark_deal_observer_spark.sources.tables import load_table
from spark_deal_observer_spark.streaming.egress import submit_eligible
from spark_deal_observer_spark.streaming.ingest import start_ingest
from spark_deal_observer_spark.streaming.sink import DealTableSink


@pytest.mark.slow  # r10 test tier: see pytest.ini
def test_three_loops_end_to_end(spark, tmp_path):
    source, table, ckpt = (str(tmp_path / d) for d in ("source", "table", "ckpt"))

    # -- loop 1: streaming ingest into the deduplicated state table --------
    load_table(spark, SF_SMALL, "events").write.mode("overwrite").parquet(source)
    q = start_ingest(spark, source, table, ckpt, available_now=True)
    q.awaitTermination(120)
    sink = DealTableSink(spark, table)
    stored = sink.count()
    assert stored > 0
    assert sink.read().where(
        F.col("payload_retrievability_state").isin(NOT_QUERIED, RESOLVED, UNRESOLVED, TERMINAL)
    ).count() == stored

    # -- loop 2: enrichment state machine over the same table --------------
    now1 = F.lit(REF_TS).cast("timestamp_ntz")
    deals = sink.read()
    # The dims are derived from the state table here; merge_overwrite will
    # REPLACE that table's files, so any plan still holding lineage into
    # them would recompute from deleted paths. localCheckpoint snapshots
    # the dims — the rule for anything read from a read-modify-write table.
    peers = (
        deals.where(F.col("miner_id") % 2 == 0)  # partial coverage, like fixtures
        .select("miner_id").dropDuplicates()
        .withColumn("peer_id", F.concat(F.lit("peer"), F.col("miner_id")))
        .localCheckpoint()
    )
    pays = (
        deals.join(peers, "miner_id")
        .where(F.col("client_id") % 3 == 0)
        .select("peer_id", "piece_cid").dropDuplicates()
        .withColumn("payload_cid", F.concat(F.lit("bafyE2E"), F.col("piece_cid")))
        .localCheckpoint()
    )
    def state_counts(df):
        return {r["payload_retrievability_state"]: r["n"] for r in
                df.groupBy("payload_retrievability_state").agg(F.count("*").alias("n")).collect()}

    # the work queue (P4) recomputed independently of the engine
    cutoff1 = F.expr(f"TIMESTAMP_NTZ '{REF_TS}' - INTERVAL 3 DAYS")
    queue1 = deals.where(
        F.col("payload_cid").isNull()
        & F.col("payload_retrievability_state").isin(NOT_QUERIED, UNRESOLVED)
        & (F.col("last_payload_retrieval_attempt").isNull()
           | (F.col("last_payload_retrieval_attempt") < cutoff1))
    ).count()
    states0 = state_counts(deals)

    after1 = resolve_tick(deals, peers, pays, now1, max_deals=None)
    sink.merge_overwrite(after1, ["id"])
    t1 = sink.read()
    assert t1.count() == stored  # enrichment never adds or drops rows
    states1 = state_counts(t1)
    assert states1.get(RESOLVED, 0) > states0.get(RESOLVED, 0)
    assert states1.get(UNRESOLVED, 0) > 0
    # exactly the queue was attempted, and every attempt was stamped
    assert t1.where(F.col("last_payload_retrieval_attempt") == now1).count() == queue1

    # second tick inside the 3-day backoff: a strict no-op
    after2 = resolve_tick(t1, peers, pays, now1, max_deals=None)
    sink.merge_overwrite(after2, ["id"])
    assert state_counts(sink.read()) == states1

    # third tick after the backoff: every retried UNRESOLVED miss absorbs to
    # TERMINAL (hits resolve) — no queue-eligible UNRESOLVED survives it
    now2 = F.expr(f"TIMESTAMP_NTZ '{REF_TS}' + INTERVAL 4 DAYS")
    after3 = resolve_tick(sink.read(), peers, pays, now2, max_deals=None)
    sink.merge_overwrite(after3, ["id"])
    t3 = sink.read()
    states3 = state_counts(t3)
    assert states3.get(TERMINAL, 0) > states1.get(TERMINAL, 0)
    assert t3.where(
        F.col("payload_cid").isNull()
        & (F.col("payload_retrievability_state") == UNRESOLVED)
        & (F.col("last_payload_retrieval_attempt") < now2)
    ).count() == 0

    # -- loop 3: egress of the now-eligible deals --------------------------
    res = submit_eligible(sink, lambda p: {"ingested": len(p)}, now=now1)
    # rows flagged THIS tick (some deals arrive pre-submitted in the corpus)
    flagged = t3.sparkSession.read.parquet(table).where(F.col("submitted_at") == now1)
    # every submitted deal was resolved and not previously submitted
    assert res["submitted"] > 0
    assert flagged.count() == res["submitted"]
    assert flagged.where(F.col("payload_cid").isNull()).count() == 0
    # a second egress tick finds nothing (mark-submitted is effective)
    res2 = submit_eligible(sink, lambda p: {"ingested": len(p)}, now=now1)
    assert res2["submitted"] == 0


@pytest.mark.slow  # r10 test tier: see pytest.ini
def test_three_loops_concurrent_soak(spark, tmp_path):
    """VERDICT r8 #6: the reference runs ingest, enrichment and egress
    SIMULTANEOUSLY against one table (Promise.all,
    deal-observer-backend.js:165-173); the sequential test above cannot
    witness the isolation story. Here all three run as concurrent
    streaming queries with overlapping 1-second triggers against the
    same state table — ingest as the file-source query, enrichment and
    egress as rate-source-clocked tick loops — serialized per tick by
    streaming/concurrency.table_lock. Invariants at the end: no lost
    updates (every ingested key present exactly once despite full-table
    merge rewrites interleaving with appends), no deal both submitted
    and unresolved, and the egress counters agree with the flags in the
    table."""
    import threading
    import time

    source, table, ck_i, ck_e, ck_g = (
        str(tmp_path / d) for d in ("source", "table", "ck_i", "ck_e", "ck_g")
    )
    from spark_deal_observer_spark.operators.merge import DEAL_KEY
    from spark_deal_observer_spark.streaming.concurrency import table_span
    from spark_deal_observer_spark.streaming.ingest import DEAL_SELECT_EXPRS

    from pyspark.sql.window import Window

    # Slices must be TIME-ORDERED (like real chain ingest): the ingest
    # stream's dedup watermark advances to max(ts) − lag after each
    # slice, so a time-INTERLEAVED slicing (event_id % k) makes most of
    # every later slice arrive below the watermark and drop as late —
    # correct streaming semantics, wrong fixture (observed: 412/1000).
    n_slices = 5
    ev = (
        load_table(spark, SF_SMALL, "events")
        .withColumn(
            "__slice", F.ntile(n_slices).over(Window.orderBy("ts", "event_id"))
        )
        .localCheckpoint()
    )
    expected = ev.selectExpr(*DEAL_SELECT_EXPRS).dropDuplicates(list(DEAL_KEY))
    n_expected = expected.count()
    ev.where(F.col("__slice") == 1).drop("__slice").coalesce(2).write.mode(
        "append"
    ).parquet(source)

    sink = DealTableSink(spark, table)
    now1 = F.lit(REF_TS).cast("timestamp_ntz")
    errors: list = []
    enrich_ticks, egress_results, seen_counts = [], [], []
    lock_stats = threading.Lock()
    stopping = threading.Event()  # q.stop() cancels in-flight tick jobs;
    # those cancellations are teardown noise, not isolation failures

    def enrich_tick(_batch, _id):
        try:
            with table_span(table):
                if not sink.exists():
                    return
                deals = sink.read()
                peers = (
                    deals.where(F.col("miner_id") % 2 == 0)
                    .select("miner_id").dropDuplicates()
                    .withColumn("peer_id", F.concat(F.lit("peer"), F.col("miner_id")))
                    .localCheckpoint()
                )
                pays = (
                    deals.join(peers, "miner_id")
                    .where(F.col("client_id") % 3 == 0)
                    .select("peer_id", "piece_cid").dropDuplicates()
                    .withColumn("payload_cid", F.concat(F.lit("bafySOAK"), F.col("piece_cid")))
                    .localCheckpoint()
                )
                n_before = deals.count()
                after = resolve_tick(deals, peers, pays, now1, max_deals=None)
                sink.merge_overwrite(after.select(*deals.columns), ["id"])
            with lock_stats:
                enrich_ticks.append(time.monotonic())
                seen_counts.append(n_before)
        except Exception as e:  # surfaced in the final assert
            if not stopping.is_set():
                errors.append(("enrich", e))

    def egress_tick(_batch, _id):
        try:
            with table_span(table):
                if not sink.exists():
                    return
                res = submit_eligible(sink, lambda p: {"ingested": len(p)}, now=now1)
            with lock_stats:
                egress_results.append(res)
        except Exception as e:
            if not stopping.is_set():
                errors.append(("egress", e))

    def rate_loop(name, ckpt, body):
        # 3 s ticks: an enrich/egress tick is a multi-second full merge;
        # at 1 s the two tick loops monopolize the table lock and starve
        # ingest (observed: 412/1000 rows after 120 s) — the same pacing
        # pressure the reference handles with its loop intervals
        return (
            spark.readStream.format("rate").option("rowsPerSecond", 1).load()
            .writeStream.queryName(name).foreachBatch(body)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="3 seconds")
            .start()
        )

    q_ingest = start_ingest(
        spark, source, table, ck_i,
        processing_time="1 second", partitioned=False,
    )
    q_enrich = rate_loop("soak_enrich", ck_e, enrich_tick)
    q_egress = rate_loop("soak_egress", ck_g, egress_tick)
    try:
        # feed the remaining slices while all three loops are live
        for i in range(2, n_slices + 1):
            time.sleep(1.0)
            ev.where(F.col("__slice") == i).drop("__slice").coalesce(2).write.mode(
                "append"
            ).parquet(source)
        deadline = time.monotonic() + 240
        while time.monotonic() < deadline:
            with lock_stats:
                done_enrich = len(enrich_ticks) >= 3
                done_egress = sum(r["submitted"] for r in egress_results) > 0
            # reads race the merge swaps like any other loop: take the lock
            with table_span(table):
                n_now = sink.count()
            if done_enrich and done_egress and n_now == n_expected:
                # one more enrichment+egress round over the final table
                with lock_stats:
                    n_e = len(enrich_ticks)
                    n_g = len(egress_results)
                while time.monotonic() < deadline:
                    with lock_stats:
                        if len(enrich_ticks) > n_e and len(egress_results) > n_g:
                            break
                    time.sleep(0.5)
                break
            time.sleep(0.5)
    finally:
        stopping.set()
        for q in (q_ingest, q_enrich, q_egress):
            q.stop()
        for q in (q_ingest, q_enrich, q_egress):
            q.awaitTermination(30)

    assert not errors, errors[:3]
    with lock_stats:
        assert len(enrich_ticks) >= 3
        assert len(egress_results) >= 3

    t = sink.read().localCheckpoint()
    # dedup + no lost updates: despite merge rewrites racing appends,
    # exactly the expected key set survives, each key once
    assert t.count() == n_expected
    assert t.dropDuplicates(list(DEAL_KEY)).count() == n_expected
    assert t.select("id").distinct().count() == n_expected
    # enrichment observed the table GROWING (it really ran mid-ingest)
    assert min(seen_counts) < n_expected

    # no deal both submitted and unresolved: every row flagged this run
    # had a payload at flag time (the eligibility predicate keys on
    # payload_cid, matching the reference — corpus rows are BORN in any
    # state, some with payloads, so a bare state assert would be wrong).
    # The lost-update anomaly the lock prevents would surface as a row
    # BOTH flagged AND attempted-this-run-with-a-miss (enrichment clears
    # the payload and sets UNRESOLVED/TERMINAL on a miss; a flagged row
    # has a payload, so the queue can never pick it up afterward — the
    # combination can only appear if one loop's merge clobbered the
    # other's).
    flagged = t.where(F.col("submitted_at") == now1)
    assert flagged.where(F.col("payload_cid").isNull()).count() == 0
    assert (
        flagged.where(
            (F.col("last_payload_retrieval_attempt") == now1)
            & F.col("payload_retrievability_state").isin(UNRESOLVED, TERMINAL)
        ).count()
        == 0
    )
    # counters consistent: the sum of per-tick submitted counts equals the
    # rows the table says were flagged this run (no double submission)
    assert sum(r["submitted"] for r in egress_results) == flagged.count()
    assert flagged.count() > 0
    # state machine stayed inside its domain throughout
    assert t.where(
        ~F.col("payload_retrievability_state").isin(
            NOT_QUERIED, RESOLVED, UNRESOLVED, TERMINAL
        )
    ).count() == 0
