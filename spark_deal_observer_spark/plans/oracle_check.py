"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs a registered Spark query and its oracle SQL side by side at a given
scale factor, sorts columns by name, sorts rows, and compares values
exactly (the driver hashes values, so only bit-identical results pass —
this harness is intentionally at least as strict).
"""

from __future__ import annotations

import datetime as _dt
import math
import os
from typing import Any

import duckdb
from pyspark.sql import SparkSession

from ..sources.tables import TABLES


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def _norm(v: Any) -> Any:
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, bytes):
        return v
    if isinstance(v, int):
        return int(v)
    return v


def _canon(rows: list[tuple], cols: list[str]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(type(x)), str(x)) for x in t))
    return out


def compare_query(
    spark: SparkSession,
    sf_dir: str,
    spark_fn,
    oracle_sql: str,
    max_report: int = 3,
) -> tuple[bool, str]:
    sdf = spark_fn(spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]

    con = duckdb_connect(sf_dir)
    cur = con.execute(oracle_sql)
    d_cols = [c[0] for c in cur.description]
    d_rows = cur.fetchall()

    if sorted(s_cols) != sorted(d_cols):
        return False, f"column mismatch: spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    if len(s_rows) != len(d_rows):
        return False, f"row-count mismatch: spark={len(s_rows)} duckdb={len(d_rows)}"

    sc = _canon(s_rows, list(s_cols))
    dc = _canon(d_rows, d_cols)
    diffs = [(a, b) for a, b in zip(sc, dc) if a != b]
    if diffs:
        sample = "; ".join(f"spark={a} oracle={b}" for a, b in diffs[:max_report])
        return False, f"{len(diffs)}/{len(sc)} differing rows (cols sorted={sorted(s_cols)}): {sample}"
    return True, f"ok ({len(sc)} rows)"
