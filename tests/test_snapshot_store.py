"""Contract tests for the SHARED crash-safety protocol in
streaming/atomic.py — the one implementation of committed-only
selection, strictly-below replay reads, high-water ledgers, write-ahead
intents, and swap-debris recovery that every stateful sink delegates to.
Each rule here used to live (slightly differently) in several sinks, and
every r4/r5 replay defect was one of those divergences; the per-sink
chaos tests in test_crash_recovery.py stay as end-to-end coverage."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow  # r10 test tier: see pytest.ini

import json
import os
import shutil

from spark_deal_observer_spark.streaming.atomic import (
    JsonLedger,
    SnapshotStore,
    gc_swap_debris,
    swap_dir,
)


def _tear(dst: str) -> None:
    """Simulate a crash mid-commit: files present, no _SUCCESS marker."""
    os.makedirs(dst, exist_ok=True)
    open(os.path.join(dst, "part-00000.parquet"), "w").write("x")


# ---------------------------------------------------------------- store


def test_store_selection_sees_only_committed(spark, tmp_path):
    store = SnapshotStore(spark, str(tmp_path / "s"))
    df = spark.range(3)
    store.write(df, 0)
    store.write(df, 2)
    _tear(store.path(5))  # torn: must be invisible everywhere
    assert store.ids() == [0, 2]
    assert store.latest_id() == 2
    assert store.prior_id(5) == 2
    assert store.prior_id(2) == 0  # strictly below, not at
    assert store.prior_id(0) is None


def test_store_pre_ingest_reads_are_empty_typed(spark, tmp_path):
    store = SnapshotStore(spark, str(tmp_path / "s"))
    schema = "k STRING, n BIGINT"
    for df in (store.read_latest(schema), store.read_prior(7, schema)):
        assert df.count() == 0
        assert df.schema.simpleString() == "struct<k:string,n:bigint>"
    assert store.read_latest() is None
    assert store.read_prior(7) is None


def test_store_replay_overwrite_heals_torn_snapshot(spark, tmp_path):
    store = SnapshotStore(spark, str(tmp_path / "s"))
    store.write(spark.range(4), 0)
    _tear(store.path(1))  # batch 1 crashed mid-commit
    # the redelivery reads prior state (strictly below 1 → snapshot 0)
    assert store.prior_id(1) == 0
    store.write(store.read_prior(1).selectExpr("id + 10 AS id"), 1)
    assert store.ids() == [0, 1]
    assert sorted(r["id"] for r in store.read(1).collect()) == [10, 11, 12, 13]


def test_store_gc_keeps_newest(spark, tmp_path):
    store = SnapshotStore(spark, str(tmp_path / "s"))
    for i in range(5):
        store.write(spark.range(2), i)
    _tear(store.path(99) + "_not_numeric")  # ignored: wrong name shape
    store.gc(keep=2)
    assert store.ids() == [3, 4]


def test_store_read_all_rederives_id_column(spark, tmp_path):
    store = SnapshotStore(spark, str(tmp_path / "r"), "batch_id")
    for i in (0, 1):
        store.write(spark.range(2).selectExpr("id AS v"), i)
    rows = {(r["batch_id"], r["v"]) for r in store.read_all().collect()}
    assert rows == {(0, 0), (0, 1), (1, 0), (1, 1)}


# --------------------------------------------------------------- ledger


def test_ledger_is_o1_on_sequential_ids(tmp_path):
    led = JsonLedger(str(tmp_path / "m" / "ledger.json"))
    for i in range(10_000):
        led.mark_seen(i)
    assert led.seen(9_999) and led.seen(0) and not led.seen(10_000)
    # the r5 defect: a seen-id LIST grows O(ticks); the high-water mark
    # keeps the file constant-sized no matter how long the stream lives
    assert os.path.getsize(led.path) < 200


def test_ledger_sparse_ids_stay_exact(tmp_path):
    led = JsonLedger(str(tmp_path / "ledger.json"))
    for i in (0, 1, 5, 7):
        led.mark_seen(i)
    assert led.seen(5) and led.seen(7) and led.seen(1)
    assert not led.seen(2) and not led.seen(6) and not led.seen(8)
    led.mark_seen(2)
    led.mark_seen(3)
    led.mark_seen(4)
    led.mark_seen(6)  # contiguous now: everything folds into the mark
    st = json.load(open(led.path))
    assert st == {"high_water": 7, "extra": [], "pending": None}


def test_ledger_reads_legacy_formats(tmp_path):
    # oldest: bare id list
    p1 = str(tmp_path / "bare.json")
    json.dump([0, 1, 2], open(p1, "w"))
    led = JsonLedger(p1)
    assert led.seen(2) and not led.seen(3)
    # r5: {"seen": [...], "pending": ...} — sparse ids preserved exactly
    p2 = str(tmp_path / "seen.json")
    json.dump({"seen": [0, 2], "pending": {"batch_id": 3}}, open(p2, "w"))
    led2 = JsonLedger(p2)
    assert led2.seen(0) and led2.seen(2) and not led2.seen(1)
    assert led2.pending() == {"batch_id": 3}


def test_ledger_intent_round_trip(tmp_path):
    led = JsonLedger(str(tmp_path / "ledger.json"))
    led.mark_seen(0)
    intent = {"batch_id": 1, "tmp": "/x", "days": ["2024-01-01"]}
    led.set_pending(intent)
    assert led.pending() == intent
    assert not led.seen(1)  # intent recorded ≠ seen; recovery marks it
    led.mark_seen(1)  # one atomic write clears pending WITH the mark
    assert led.pending() is None and led.seen(1)


# ---------------------------------------------------------- swap debris


def test_gc_swap_debris_restores_newest_backup(tmp_path):
    live = str(tmp_path / "t")
    # repeated crashes stacked several backups and the live dir is gone —
    # glob order must NOT pick the stale one (the r5 ADVICE finding)
    old1 = f"{live}__old_aaaaaaaa"  # globs first, but is the STALE copy
    old2 = f"{live}__old_zzzzzzzz"
    for d, stamp in ((old1, 100), (old2, 200)):
        os.makedirs(d)
        open(os.path.join(d, "marker"), "w").write(d)
        os.utime(d, (stamp, stamp))
    os.makedirs(f"{live}__stage_123")
    gc_swap_debris(live)
    assert open(os.path.join(live, "marker")).read() == old2
    assert not os.path.exists(old1) and not os.path.exists(old2)
    assert not os.path.exists(f"{live}__stage_123")


def test_gc_swap_debris_sweeps_backups_when_live_exists(tmp_path):
    live = str(tmp_path / "t")
    os.makedirs(live)
    open(os.path.join(live, "marker"), "w").write("live")
    old = f"{live}__old_deadbeef"
    os.makedirs(old)
    gc_swap_debris(live)
    assert open(os.path.join(live, "marker")).read() == "live"
    assert not os.path.exists(old)


def test_swap_dir_replaces_and_cleans(tmp_path):
    live, staged = str(tmp_path / "live"), str(tmp_path / "staged")
    for d, content in ((live, "old"), (staged, "new")):
        os.makedirs(d)
        open(os.path.join(d, "f"), "w").write(content)
    swap_dir(staged, live)
    assert open(os.path.join(live, "f")).read() == "new"
    assert not os.path.exists(staged)
    import glob

    assert not glob.glob(f"{live}__old_*")  # backup removed on success


def test_rollup_ledger_file_stays_bounded(spark, tmp_path):
    """Verdict r5 #2: the rollup ledger must not grow O(ticks). Drive the
    sink through many ticks (sparse ids included) and assert the durable
    ledger file stays constant-sized."""
    from spark_deal_observer_spark.streaming.rollup_sink import (
        HourlyRollupSink,
    )

    events = spark.createDataFrame(
        [(1, "a", 1.0)], "event_id BIGINT, event_type STRING, value DOUBLE"
    ).selectExpr("event_id", "event_type", "value",
                 "TIMESTAMP_NTZ '2024-01-01 00:00:00' AS ts")
    sink = HourlyRollupSink(spark, str(tmp_path / "roll"))
    ids = [*range(8), 20, 21]  # a gap: exceptions stay exact
    for i in ids:
        sink.process_batch(events, batch_id=i)
    st = json.load(open(sink.ledger.path))
    # high-water + exception set, never the O(ticks) id list: the mark
    # covers the contiguous prefix, extra holds only the two gap ids
    assert st["high_water"] == 7 and st["extra"] == [20, 21]
    assert sink.ledger.seen(7) and not sink.ledger.seen(9)
    n = sink.read_hourly().agg({"n_events": "sum"}).first()[0]
    assert n == len(ids)  # every non-replayed tick merged exactly once


def test_bounded_line_dedup_still_green_after_port(spark, tmp_path):
    """Smoke: the SnapshotStore port preserves the bounded tier's
    dedup-and-GC behavior end to end."""
    from spark_deal_observer_spark.streaming.line_dedup import (
        BoundedLineDedupIngestSink,
    )

    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a c")], "doc_id BIGINT, text STRING"
    )
    sink = BoundedLineDedupIngestSink(
        spark, str(tmp_path / "ld"), ttl_batches=2, keep_snapshots=2
    )
    for i in range(4):
        sink.process_batch(docs.selectExpr(f"doc_id + {2 * i} AS doc_id", "text"), i)
    assert len(sink._store.ids()) <= 2  # GC bound holds
    assert sink.read_docs().count() == 8


def test_read_all_excludes_torn_dirs(spark, tmp_path):
    """A report reader between a crash and the redelivery must not see
    the torn directory's partial rows as if they were final."""
    store = SnapshotStore(spark, str(tmp_path / "r"), "batch_id")
    store.write(spark.range(3).selectExpr("id AS v"), 0)
    # batch 1 crashed mid-commit: copy a committed part file, no _SUCCESS
    torn = store.path(1)
    os.makedirs(torn)
    src = store.path(0)
    part = next(f for f in os.listdir(src) if f.endswith(".parquet"))
    shutil.copy(os.path.join(src, part), os.path.join(torn, part))
    rows = {(r["batch_id"], r["v"]) for r in store.read_all().collect()}
    assert rows == {(0, 0), (0, 1), (0, 2)}
    # the redelivery overwrites and commits; now it IS visible
    store.write(spark.range(2).selectExpr("id + 10 AS v"), 1)
    assert store.read_all().count() == 5


def test_keep_snapshots_bounds_sink_disk(spark, tmp_path):
    """Opt-in snapshot-horizon GC: a long-lived stream's snapshot dirs
    must stop scaling with tick count (replay needs only the tail)."""
    from spark_deal_observer_spark.streaming.cardinality import (
        CardinalityMonitorSink,
    )

    events = spark.createDataFrame(
        [(1, "a"), (2, "b")], "user_id BIGINT, event_type STRING"
    )
    sink = CardinalityMonitorSink(
        spark, str(tmp_path / "c"), keep_snapshots=2
    )
    for i in range(6):
        sink.process_batch(events, batch_id=i)
    assert sink._regs.ids() == [4, 5]
    # the maintained estimate still reflects every tick's merge
    got = {r["event_type"]: r["distinct_est"] for r in sink.read_report().where("batch_id = 5").collect()}
    assert set(got) == {"a", "b"}
