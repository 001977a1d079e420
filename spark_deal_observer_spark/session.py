"""SparkSession construction tuned for this engine.

The reference runs a single-threaded Node process and delegates planning to
PostgreSQL (SURVEY.md §4). Here all planning is Catalyst's; this module only
sets the knobs that matter at scale: AQE (runtime re-planning + skew-join
splitting), a shuffle-partition count sized to the test harness, Arrow for
every pandas-UDF boundary, and a UTC session so epoch math is deterministic
across engines.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

GENESIS_UNIX = 1_598_306_400  # Filecoin genesis (reference db/migrations/005:4-7)
EPOCH_SECONDS = 30


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def apply_runtime_conf(spark: SparkSession) -> SparkSession:
    """Set runtime-mutable confs on an externally provided session.

    The driver hands us its own SparkSession; timezone determinism and AQE
    must still hold there.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    for k, v in (
        ("spark.sql.adaptive.enabled", "true"),
        ("spark.sql.adaptive.coalescePartitions.enabled", "true"),
        # events.ts is parquet TIMESTAMP(NANOS); Spark's vectorized reader
        # rejects it outright — read as long nanos, normalized to a micros
        # timestamp in sources.tables.load_table.
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
    ):
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # static conf on some builds; harmless
    return spark


def get_spark(app_name: str = "spark-deal-observer-spark", *, shuffle_partitions: int | None = None) -> SparkSession:
    cpus = default_parallelism()
    shuffle = shuffle_partitions or cpus
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.filterPushdown", "true")
    )
    return apply_runtime_conf(builder.getOrCreate())
