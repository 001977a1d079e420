"""Z-order (Morton-curve) data layout for multi-dimensional data skipping.

A 100 TB table is usually range-partitioned on ONE key (time), so point
queries on a second key (provider, customer, shard) scan every file.
Z-ordering interleaves the bits of both keys into a single sort key whose
curve locality bounds EVERY dimension's min/max within a file — parquet
footer stats then prune on either predicate. This is the layout trick
behind Delta/Iceberg `OPTIMIZE ZORDER BY`, expressed here as plain
generated SQL:

  * quantize  — each dimension rescales to ZBITS-bit integers against its
                observed bounds; the bounds come from a 1-row min/max
                aggregate broadcast-cross-joined back (map-side combined,
                never a global sort and never an unpartitioned window).
  * interleave — z = Σ_i bit_i(x)<<2i | bit_i(y)<<(2i+1), UNROLLED at
                plan-build time into 2·ZBITS literal shift-add terms over
                the quantized columns: scan-stage, whole-stage-codegen'd,
                no Python, and bit-identical in the DuckDB twin. (The
                `aggregate(sequence(...))` higher-order form computes the
                same value but is interpreted per element — the measured
                ~4× penalty of the pre-r3 JL projection.)
  * layout    — writers `repartitionByRange(zkey)` + sortWithinPartitions
                so each output file owns a compact z-range (a square-ish
                tile in key space); the registered query reports per-tile
                min/max of BOTH dimensions — the same stats a parquet
                footer would carry — making the pruning bound auditable.

The registered query z-orders `orders` on (order day, customer key): a
fixed z-prefix tile is a 16×16 cell of the 256×256 quantized key square,
so every tile's per-dimension spread is ≤ 1/16 of the domain — the
data-skipping guarantee, asserted in tests/test_layout.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ZBITS = 8  # quantization bits per dimension (256 cells)
TILE_SHIFT = 8  # z >> TILE_SHIFT → 256 tiles = 16×16 cells each


def _interleave_sql(dialect: str, x: str, y: str, bits: int = ZBITS) -> str:
    """Morton interleave of two `bits`-bit integers (x even bits, y odd).

    Spark side is unrolled to literal shift-add terms so the whole key
    stays inside whole-stage codegen (HOF lambdas are interpreted per
    element); pass COLUMN REFERENCES for x/y — each is repeated 2·bits
    times. The DuckDB twin keeps the list form (DuckDB vectorizes it)."""
    if dialect == "spark":
        terms = [
            f"shiftleft((shiftright({x}, {i}) & 1), {2 * i}) + "
            f"shiftleft((shiftright({y}, {i}) & 1), {2 * i + 1})"
            for i in range(bits)
        ]
        return "CAST(" + " + ".join(terms) + " AS BIGINT)"
    return (
        f"list_sum(list_transform(generate_series(0, {bits - 1}), i -> "
        f"((({x} >> i) & 1) << (2 * i)) + ((({y} >> i) & 1) << (2 * i + 1))))"
    )


def _quantize_sql(dialect: str, v: str, lo: str, hi: str, bits: int = ZBITS) -> str:
    """Rescale `v` from [lo, hi] to a `bits`-bit integer (floor division)."""
    cells = 1 << bits
    div = "div" if dialect == "spark" else "//"
    return f"((({v}) - ({lo})) * {cells} {div} (({hi}) - ({lo}) + 1))"


def zorder_key(
    df: DataFrame, xcol: str, ycol: str, bounds: DataFrame
) -> DataFrame:
    """Attach the Morton key for (xcol, ycol); `bounds` is the 1-row
    (x_lo, x_hi, y_lo, y_hi) table, broadcast-cross-joined so the key is a
    pure scan-stage expression."""
    qx = _quantize_sql("spark", xcol, "x_lo", "x_hi")
    qy = _quantize_sql("spark", ycol, "y_lo", "y_hi")
    # quantize once into named columns, then interleave over the column
    # refs — the unrolled form repeats each operand 2·ZBITS times, and
    # repeating the quantize division that often would bloat the
    # generated code for no reason.
    return (
        df.crossJoin(F.broadcast(bounds))
        .withColumn("zq_x", F.expr(qx).cast("bigint"))
        .withColumn("zq_y", F.expr(qy).cast("bigint"))
        .withColumn("zkey", F.expr(_interleave_sql("spark", "zq_x", "zq_y")))
        .drop("zq_x", "zq_y")
    )


def order_day(dialect: str = "spark") -> str:
    """Orders' day number — datediff from the TPC-H epoch, both dialects."""
    if dialect == "spark":
        return "datediff(o_orderdate, DATE '1992-01-01')"
    return "datediff('day', DATE '1992-01-01', o_orderdate)"


def zorder_tiles(orders: DataFrame) -> DataFrame:
    """Per-tile layout audit of z-ordered orders: tile id, row count, and
    min/max of BOTH dimensions — bounded spreads on each are the
    data-skipping guarantee a z-ordered file layout provides."""
    day = order_day("spark")
    bounds = orders.agg(
        F.expr(f"min({day})").alias("x_lo"),
        F.expr(f"max({day})").alias("x_hi"),
        F.min("o_custkey").alias("y_lo"),
        F.max("o_custkey").alias("y_hi"),
    )
    keyed = zorder_key(
        orders.select(F.expr(day).alias("day"), "o_custkey"), "day", "o_custkey", bounds
    )
    return (
        keyed.groupBy(F.expr(f"zkey div {1 << TILE_SHIFT}").alias("tile"))
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.min("day").alias("min_day"),
            F.max("day").alias("max_day"),
            F.min("o_custkey").alias("min_ck"),
            F.max("o_custkey").alias("max_ck"),
        )
    )


def zorder_write(orders: DataFrame, path: str, n_files: int = 8) -> None:
    """The write path: range-partition on the z-key and sort within each
    partition, so every output file owns one compact z-range. File-level
    parquet min/max stats on day AND custkey then prune either predicate."""
    day = order_day("spark")
    bounds = orders.agg(
        F.expr(f"min({day})").alias("x_lo"),
        F.expr(f"max({day})").alias("x_hi"),
        F.min("o_custkey").alias("y_lo"),
        F.max("o_custkey").alias("y_hi"),
    )
    keyed = zorder_key(orders.withColumn("day", F.expr(day)), "day", "o_custkey", bounds)
    (
        keyed.repartitionByRange(n_files, "zkey")
        .sortWithinPartitions("zkey")
        .write.mode("overwrite")
        .parquet(path)
    )


def zorder_tiles_oracle() -> str:
    day = order_day("duckdb")
    qx = _quantize_sql("duckdb", "day", "x_lo", "x_hi")
    qy = _quantize_sql("duckdb", "o_custkey", "y_lo", "y_hi")
    z = _interleave_sql("duckdb", qx, qy)
    return f"""
        WITH src AS (SELECT {day} AS day, o_custkey FROM orders),
        bounds AS (
          SELECT min(day) AS x_lo, max(day) AS x_hi,
                 min(o_custkey) AS y_lo, max(o_custkey) AS y_hi
          FROM src),
        keyed AS (
          SELECT day, o_custkey, {z} AS zkey
          FROM src CROSS JOIN bounds)
        SELECT zkey // {1 << TILE_SHIFT} AS tile,
               CAST(count(*) AS BIGINT) AS n_rows,
               min(day) AS min_day, max(day) AS max_day,
               min(o_custkey) AS min_ck, max(o_custkey) AS max_ck
        FROM keyed
        GROUP BY tile
    """


COMPACT_TARGET = 50_000  # target output-file payload (chars as byte proxy)


def compaction_plan(docs: DataFrame) -> DataFrame:
    """(source, file_id, n_docs, total_chars): the small-file compaction
    planner — within each source, documents are packed in doc_id order
    into output files of ~COMPACT_TARGET payload via the exclusive
    running-size bin (floor(cum_before / target)), the deterministic
    streaming-friendly alternative to first-fit-decreasing (no global
    sort, no driver loop).

    The window partitions by source, so the plan step shuffles each
    source's FILE-LEVEL rows once and sources pack in parallel; at 100 TB
    the input is the catalog's per-file stats table (path, bytes), not
    per-document rows — the shape is identical, the row count is
    |files|."""
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    assigned = docs.select("doc_id", "source", "n_chars").select(
        "source",
        "n_chars",
        F.floor(
            F.coalesce(F.sum("n_chars").over(w), F.lit(0)) / COMPACT_TARGET
        )
        .cast("int")
        .alias("file_id"),
    )
    return assigned.groupBy("source", "file_id").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
    )


def compaction_plan_oracle() -> str:
    return f"""
        WITH assigned AS (
            SELECT source,
                   n_chars,
                   CAST(floor(COALESCE(sum(n_chars) OVER (
                       PARTITION BY source ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) / {COMPACT_TARGET}) AS INT) AS file_id
            FROM documents)
        SELECT source, file_id,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS total_chars
        FROM assigned GROUP BY source, file_id
    """


# -- zonemap pruning audit -----------------------------------------------------

ZM_NATURAL_CHUNK = 64  # orderkeys per "file" in insert order
ZM_SHIP_CHUNK = 28  # days per "file" in shipdate-sorted order

# the predicate panel a 100 TB consumer actually runs: a time slice, a
# point lookup on the second key, and the combined box. Bounds are day
# numbers from the TPC-H epoch / raw suppkeys; None = unbounded.
ZM_PREDICATES = [
    # (name, d_lo_sql, d_hi_sql, s_lo, s_hi)
    ("ship_30d", "DATE '1996-03-01'", "DATE '1996-03-30'", None, None),
    ("supp_point", None, None, 3, 3),
    ("ship_and_supp", "DATE '1996-03-01'", "DATE '1996-03-30'", 2, 5),
]


def _ship_day(dialect: str = "spark") -> str:
    if dialect == "spark":
        return "datediff(l_shipdate, DATE '1992-01-01')"
    return "datediff('day', DATE '1992-01-01', l_shipdate)"


def _pred_day_bounds(dialect: str, lo_sql: str | None, hi_sql: str | None):
    fmt = (
        "datediff({d}, DATE '1992-01-01')"
        if dialect == "spark"
        else "datediff('day', DATE '1992-01-01', {d})"
    )
    lo = fmt.format(d=lo_sql) if lo_sql else str(-(1 << 40))
    hi = fmt.format(d=hi_sql) if hi_sql else str(1 << 40)
    return lo, hi


def zonemap_pruning_report(lineitem: DataFrame) -> DataFrame:
    """(layout, predicate, n_chunks, chunks_scanned, rows_total,
    rows_scanned, chunk_fraction, row_fraction): how much of the table a
    min/max-pruned scan actually reads, per physical LAYOUT × predicate —
    the data-skipping audit that justifies (or indicts) a layout choice
    BEFORE a 100 TB rewrite. Chunks stand in for parquet files; each
    layout's chunk key is the value-range a range-partitioned writer
    would produce (never a global row_number — a whole-table rank is the
    single-task trap this report exists to avoid):

      * natural  — l_orderkey ranges (insert order): prunes the time
                   predicate incidentally (orderkeys correlate with
                   dates), nothing else.
      * shipdate — 4-weekly shipdate ranges: optimal for the time slice,
                   useless for the supplier point lookup.
      * zorder   — Morton tiles over (ship day, suppkey): bounded spread
                   on BOTH dimensions (the zorder_tiles guarantee), so
                   every panel predicate prunes.

    The zonemap itself is one map-side-combined aggregate per layout
    (min/max/count per chunk — exactly the stats a parquet footer
    carries), the audit is a chunk-table × 3-predicate cross join over
    metadata-sized rows, and every fraction is ONE division of exact
    integers (the seasonal-decompose determinism rule)."""
    day = _ship_day("spark")
    src = lineitem.select(
        F.expr(day).alias("d"), F.col("l_suppkey").alias("s"), "l_orderkey"
    )
    bounds = src.agg(
        F.min("d").alias("x_lo"),
        F.max("d").alias("x_hi"),
        F.min("s").alias("y_lo"),
        F.max("s").alias("y_hi"),
    )
    keyed = zorder_key(src, "d", "s", bounds)
    chunked = keyed.select(
        "d",
        "s",
        F.explode(
            F.array(
                F.struct(
                    F.lit("natural").alias("layout"),
                    (F.col("l_orderkey") / ZM_NATURAL_CHUNK)
                    .cast("bigint")
                    .alias("chunk"),
                ),
                F.struct(
                    F.lit("shipdate").alias("layout"),
                    F.floor(F.col("d") / ZM_SHIP_CHUNK).cast("bigint").alias("chunk"),
                ),
                F.struct(
                    F.lit("zorder").alias("layout"),
                    (F.col("zkey") / (1 << TILE_SHIFT)).cast("bigint").alias("chunk"),
                ),
            )
        ).alias("lc"),
    )
    zones = chunked.groupBy(
        F.col("lc.layout").alias("layout"), F.col("lc.chunk").alias("chunk")
    ).agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.min("d").alias("d_min"),
        F.max("d").alias("d_max"),
        F.min("s").alias("s_min"),
        F.max("s").alias("s_max"),
    )
    spark = lineitem.sparkSession
    pred_rows = []
    for name, dlo, dhi, slo, shi in ZM_PREDICATES:
        lo, hi = _pred_day_bounds("spark", dlo, dhi)
        pred_rows.append(
            f"SELECT '{name}' AS predicate, CAST({lo} AS BIGINT) AS d_lo, "
            f"CAST({hi} AS BIGINT) AS d_hi, "
            f"CAST({slo if slo is not None else -(1 << 40)} AS BIGINT) AS s_lo, "
            f"CAST({shi if shi is not None else 1 << 40} AS BIGINT) AS s_hi"
        )
    preds = spark.sql(" UNION ALL ".join(pred_rows))
    hit = (
        (F.col("d_min") <= F.col("d_hi"))
        & (F.col("d_max") >= F.col("d_lo"))
        & (F.col("s_min") <= F.col("s_hi"))
        & (F.col("s_max") >= F.col("s_lo"))
    )
    joined = zones.crossJoin(F.broadcast(preds))
    agg = joined.groupBy("layout", "predicate").agg(
        F.count("*").cast("bigint").alias("n_chunks"),
        F.sum(F.when(hit, 1).otherwise(0)).cast("bigint").alias("chunks_scanned"),
        F.sum("n_rows").cast("bigint").alias("rows_total"),
        F.sum(F.when(hit, F.col("n_rows")).otherwise(0))
        .cast("bigint")
        .alias("rows_scanned"),
    )
    return agg.select(
        "layout",
        "predicate",
        "n_chunks",
        "chunks_scanned",
        "rows_total",
        "rows_scanned",
        F.round(F.col("chunks_scanned") / F.col("n_chunks"), 6).alias(
            "chunk_fraction"
        ),
        F.round(F.col("rows_scanned") / F.col("rows_total"), 6).alias("row_fraction"),
    )


def zonemap_pruning_report_oracle() -> str:
    day = _ship_day("duckdb")
    qx = _quantize_sql("duckdb", "d", "x_lo", "x_hi")
    qy = _quantize_sql("duckdb", "s", "y_lo", "y_hi")
    z = _interleave_sql("duckdb", qx, qy)
    pred_rows = []
    for name, dlo, dhi, slo, shi in ZM_PREDICATES:
        lo, hi = _pred_day_bounds("duckdb", dlo, dhi)
        pred_rows.append(
            f"SELECT '{name}' AS predicate, CAST({lo} AS BIGINT) AS d_lo, "
            f"CAST({hi} AS BIGINT) AS d_hi, "
            f"CAST({slo if slo is not None else -(1 << 40)} AS BIGINT) AS s_lo, "
            f"CAST({shi if shi is not None else 1 << 40} AS BIGINT) AS s_hi"
        )
    preds = " UNION ALL ".join(pred_rows)
    from ..functions.rounding import ROUND6_SHORTEST as rnd
    return f"""
        WITH zm_src AS (SELECT {day} AS d, l_suppkey AS s, l_orderkey
                        FROM lineitem),
        zm_bounds AS (SELECT min(d) AS x_lo, max(d) AS x_hi,
                             min(s) AS y_lo, max(s) AS y_hi FROM zm_src),
        zm_keyed AS (SELECT d, s, l_orderkey, {z} AS zkey
                     FROM zm_src CROSS JOIN zm_bounds),
        zm_chunked AS (
            SELECT d, s, 'natural' AS layout,
                   l_orderkey // {ZM_NATURAL_CHUNK} AS chunk FROM zm_keyed
            UNION ALL
            SELECT d, s, 'shipdate',
                   CAST(floor(d / {ZM_SHIP_CHUNK}) AS BIGINT) FROM zm_keyed
            UNION ALL
            SELECT d, s, 'zorder', zkey // {1 << TILE_SHIFT} FROM zm_keyed),
        zm_zones AS (
            SELECT layout, chunk, CAST(count(*) AS BIGINT) AS n_rows,
                   min(d) AS d_min, max(d) AS d_max,
                   min(s) AS s_min, max(s) AS s_max
            FROM zm_chunked GROUP BY layout, chunk),
        zm_preds AS ({preds}),
        zm_agg AS (
            SELECT layout, predicate,
                   CAST(count(*) AS BIGINT) AS n_chunks,
                   CAST(sum(CASE WHEN d_min <= d_hi AND d_max >= d_lo
                                  AND s_min <= s_hi AND s_max >= s_lo
                             THEN 1 ELSE 0 END) AS BIGINT) AS chunks_scanned,
                   CAST(sum(n_rows) AS BIGINT) AS rows_total,
                   CAST(sum(CASE WHEN d_min <= d_hi AND d_max >= d_lo
                                  AND s_min <= s_hi AND s_max >= s_lo
                             THEN n_rows ELSE 0 END) AS BIGINT) AS rows_scanned
            FROM zm_zones CROSS JOIN zm_preds
            GROUP BY layout, predicate)
        SELECT layout, predicate, n_chunks, chunks_scanned, rows_total,
               rows_scanned,
               {rnd.format(x="chunks_scanned / n_chunks")} AS chunk_fraction,
               {rnd.format(x="rows_scanned / rows_total")} AS row_fraction
        FROM zm_agg
    """
