"""Global ordered prefix sums without a single-partition sort.

Spark plans `sum(x) OVER (ORDER BY ...)` with no PARTITION BY as an
Exchange to ONE partition — the classic scale-killer: the whole corpus
funnels through a single task. The scalable form is the textbook two-phase
scan: range-partition on the order keys, one in-partition cumulative
window per range, then add each partition's exclusive offset (the prefix
over per-partition totals — #partitions rows, the only thing that ever
touches the driver).

Reference analog: the observer's paginated batch loops carry a running
submitted-count across pages (spark-api-submit-deals.js:17-29) — the same
accumulate-in-order contract, here as a set-oriented operator.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def global_prefix_sum(
    df: DataFrame,
    order_cols: list[Column],
    value_col: str,
    out_col: str = "cum_sum",
    n_parts: int | None = None,
) -> DataFrame:
    """`df` plus `out_col` = running sum of `value_col` in `order_cols`
    order, computed WITHOUT a global sort or single-partition window.

    `order_cols` must be a TOTAL order (include a unique tiebreak): rows
    with equal keys may straddle a range boundary, and only a total order
    makes the prefix sum well-defined regardless of where the sampler puts
    the boundaries.

    The range-partitioned frame is checkpointed BEFORE the offset pass:
    `repartitionByRange` samples its boundaries per execution, so two
    separate actions over the same plan can land rows in different
    partitions — the per-partition offsets would then be added to the
    wrong rows. Pinning the physical partitions once makes the offset
    collect and the final window read the same layout by construction.

    Driver contract: exactly #partitions (bounded, chosen) rows are
    collected for the exclusive-prefix offsets; everything row-scaled
    stays distributed.
    """
    n = n_parts or df.sparkSession.sparkContext.defaultParallelism
    parts = (
        df.repartitionByRange(n, *order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    psums = {
        r["_pid"]: r["_s"]
        for r in parts.groupBy("_pid")
        .agg(F.sum(value_col).alias("_s"))
        .collect()
    }
    if not psums:  # empty input: nothing to offset, result is empty too
        return df.withColumn(out_col, F.lit(None).cast("bigint"))
    running, offsets = 0, {}
    for pid in sorted(psums):  # pid order IS range order under range partitioning
        offsets[pid] = running
        running += psums[pid]
    off = F.broadcast(
        df.sparkSession.createDataFrame(
            [(int(pid), val) for pid, val in offsets.items()], ["_pid", "_off"]
        ).withColumn("_pid", F.col("_pid").cast("int"))
    )
    w = (
        Window.partitionBy("_pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        parts.withColumn("_local", F.sum(value_col).over(w))
        .join(off, "_pid")
        .withColumn(out_col, F.col("_local") + F.col("_off"))
        .drop("_pid", "_local", "_off")
    )
