"""Semi-structured event ingestion: JSON/CSV with schema enforcement.

The reference's ingestion boundary is typed JSON-RPC responses validated
into typed rows (P7, rpc-service/service.js envelope parse + the zod-style
checks in deal-observer.js). When the same event stream arrives as files,
the Spark-native equivalent is an explicit-schema reader — never inference,
which samples the data and can silently flip types between runs — with one
of the three standard postures:

  * strict    — FAILFAST: any malformed record fails the batch (the
                reference throws on malformed RPC envelopes).
  * quarantine— PERMISSIVE + `_corrupt_record`: malformed rows land in a
                side channel with their raw text, clean rows flow on. The
                production posture at 100 TB: one bad producer must not
                stall the pipeline, but bad rows must stay auditable.
  * drop      — DROPMALFORMED: only when the caller explicitly accepts
                silent loss (never the default).

All readers return columns in EVENTS_DDL order with identical types to the
parquet source, so every downstream plan (deal reshape, dedup sink,
eligibility) is format-agnostic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..streaming.ingest import EVENTS_DDL

# Canonical timestamp text format, microsecond precision: Spark's default
# JSON/CSV timestampNTZFormat carries only millis and silently truncates the
# parquet source's micros — a real corpus-corruption bug at any scale.
TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"

CORRUPT_COL = "_corrupt_record"
_QUARANTINE_DDL = f"{EVENTS_DDL}, {CORRUPT_COL} STRING"

EVENT_COLUMNS = [c.split()[0] for c in EVENTS_DDL.split(", ")]


def read_events_json(
    spark: SparkSession, path: str, mode: str = "quarantine"
) -> DataFrame:
    """Events from JSON-lines with the canonical schema enforced."""
    base = spark.read.option("timestampNTZFormat", TS_FMT)
    if mode == "strict":
        reader = base.schema(EVENTS_DDL).option("mode", "FAILFAST")
    elif mode == "drop":
        reader = base.schema(EVENTS_DDL).option("mode", "DROPMALFORMED")
    elif mode == "quarantine":
        reader = (
            base.schema(_QUARANTINE_DDL)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", CORRUPT_COL)
        )
    else:
        raise ValueError(f"unknown mode {mode!r}")
    return reader.json(path)


def read_events_csv(
    spark: SparkSession, path: str, mode: str = "quarantine"
) -> DataFrame:
    """Events from headered CSV with the canonical schema enforced."""
    base = spark.read.option("header", "true").option("timestampNTZFormat", TS_FMT)
    if mode == "strict":
        reader = base.schema(EVENTS_DDL).option("mode", "FAILFAST")
    elif mode == "drop":
        reader = base.schema(EVENTS_DDL).option("mode", "DROPMALFORMED")
    elif mode == "quarantine":
        reader = (
            base.schema(_QUARANTINE_DDL)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", CORRUPT_COL)
        )
    else:
        raise ValueError(f"unknown mode {mode!r}")
    return reader.csv(path)


def split_quarantine(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean_rows, quarantined_rows) from a quarantine-mode read.

    Clean rows drop the corrupt column and match the parquet schema exactly;
    quarantined rows keep the raw record text for auditing/replay. The
    parsed frame is cached first: Spark disallows queries that reference
    ONLY the internal corrupt column on a raw file scan."""
    df = df.cache()
    clean = df.where(F.col(CORRUPT_COL).isNull()).select(*EVENT_COLUMNS)
    bad = df.where(F.col(CORRUPT_COL).isNotNull()).select(F.col(CORRUPT_COL).alias("raw"))
    return clean, bad
