"""The whole system, one table: the reference's three concurrent loops
(ingest → enrichment state machine → egress) run against a single deal
table, asserting the cross-loop invariants the reference's architecture
guarantees (deal-observer-backend.js:165-173)."""

from __future__ import annotations

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
