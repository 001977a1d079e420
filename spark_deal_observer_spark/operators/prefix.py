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
    stats = {
        r["_pid"]: (r["_s"], r["_c"])
        # coalesce: a range partition whose values are all NULL sums to
        # NULL, and the driver-side running += below must not see None;
        # the non-null COUNT is carried alongside so the final expression
        # can reproduce the window's exact NULL rule (sum over a frame
        # containing only NULLs is NULL, not 0) across partition borders
        for r in parts.groupBy("_pid")
        .agg(
            F.coalesce(F.sum(value_col), F.lit(0)).alias("_s"),
            F.count(value_col).alias("_c"),
        )
        .collect()
    }
    # out_col's type is sum(value)+offset — sum widens (int→bigint,
    # float→double, decimal grows precision), offset is bigint; derive it
    # from the plan so the empty case matches the non-empty schema exactly
    out_type = df.select(
        (F.sum(value_col) + F.lit(0).cast("bigint")).alias("_t")
    ).schema[0].dataType
    if not stats:  # empty input: nothing to offset, result is empty too
        return df.withColumn(out_col, F.lit(None).cast(out_type))
    running, running_c, offsets = 0, 0, []
    for pid in sorted(stats):  # pid order IS range order under range partitioning
        s, c = stats[pid]
        offsets.append((int(pid), running, int(running_c)))
        running += s
        running_c += int(c)
    # the first offset is always python int 0; for fractional/decimal
    # value columns later offsets widen, and createDataFrame's schema
    # inference rejects mixed int/float (or int/Decimal) column values —
    # normalize the whole column to the widest python type present
    from decimal import Decimal

    for _, v, _ in offsets:
        if isinstance(v, float):
            offsets = [(p, float(x), c) for p, x, c in offsets]
            break
        if isinstance(v, Decimal):
            offsets = [(p, Decimal(x), c) for p, x, c in offsets]
            break
    off = F.broadcast(
        df.sparkSession.createDataFrame(
            offsets, ["_pid", "_off", "_cnt_off"]
        ).withColumn("_pid", F.col("_pid").cast("int"))
    )
    w = (
        Window.partitionBy("_pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    zero = F.lit(0)
    return (
        parts.withColumn(
            "_local", F.sum(F.coalesce(F.col(value_col), zero)).over(w)
        )
        .withColumn("_nn", F.count(value_col).over(w))
        .join(off, "_pid")
        .withColumn(
            out_col,
            F.when(
                F.col("_nn") + F.col("_cnt_off") == 0,
                F.lit(None).cast(out_type),
            ).otherwise((F.col("_local") + F.col("_off")).cast(out_type)),
        )
        .drop("_pid", "_local", "_nn", "_off", "_cnt_off")
    )
