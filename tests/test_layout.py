"""Z-order layout invariants: tile locality bounds and file-level stats
after the range-partitioned write — the data-skipping guarantees themselves,
not just oracle value parity (tests/test_oracle_parity.py covers that)."""

from __future__ import annotations

from conftest import SF_SMALL
from pyspark.sql import functions as F

from spark_deal_observer_spark.operators.layout import (
    TILE_SHIFT,
    ZBITS,
    zorder_tiles,
    zorder_write,
)
from spark_deal_observer_spark.sources.tables import load_table


def test_tile_spread_is_bounded_in_both_dims(spark):
    """A z-prefix tile is a 16×16 cell square of the 256×256 quantized key
    space, so every tile's per-dimension spread must be ≤ 1/16 of that
    dimension's domain (+1 cell of quantization slack)."""
    orders = load_table(spark, SF_SMALL, "orders")
    tiles = zorder_tiles(orders).collect()
    assert len(tiles) > 10  # the layout actually spread across tiles

    day_lo = min(t.min_day for t in tiles)
    day_hi = max(t.max_day for t in tiles)
    ck_lo = min(t.min_ck for t in tiles)
    ck_hi = max(t.max_ck for t in tiles)
    # cells per tile side: tile keeps (2*ZBITS - TILE_SHIFT) z-bits, split
    # evenly between dims → 16 of 256 cells per side at the defaults
    side_cells = 2 ** ((2 * ZBITS - TILE_SHIFT) // 2)
    day_cell = (day_hi - day_lo + 1) / (2**ZBITS)
    ck_cell = (ck_hi - ck_lo + 1) / (2**ZBITS)
    for t in tiles:
        assert t.max_day - t.min_day <= (side_cells + 1) * day_cell
        assert t.max_ck - t.min_ck <= (side_cells + 1) * ck_cell


def test_zorder_write_files_prune_both_dims(spark, tmp_path):
    """After repartitionByRange(zkey) + sortWithinPartitions, per-FILE
    min/max of each dimension must be materially narrower than the domain —
    that is what parquet footer pruning will use. A time-sorted layout gives
    this on day only; z-order must give it on both."""
    orders = load_table(spark, SF_SMALL, "orders")
    out = str(tmp_path / "zordered")
    zorder_write(orders, out, n_files=8)

    per_file = (
        spark.read.parquet(out)
        .groupBy(F.input_file_name().alias("f"))
        .agg(
            F.min("day").alias("d0"),
            F.max("day").alias("d1"),
            F.min("o_custkey").alias("c0"),
            F.max("o_custkey").alias("c1"),
        )
        .collect()
    )
    assert len(per_file) >= 4
    day_span = max(r.d1 for r in per_file) - min(r.d0 for r in per_file) + 1
    ck_span = max(r.c1 for r in per_file) - min(r.c0 for r in per_file) + 1
    # average per-file spread ≤ 3/4 of the domain in BOTH dims: each file
    # covers a compact z-range, i.e. a band of square-ish tiles, not the
    # full rectangle (a single-dim sort would leave the other dim at ~1.0)
    avg_day = sum(r.d1 - r.d0 + 1 for r in per_file) / len(per_file)
    avg_ck = sum(r.c1 - r.c0 + 1 for r in per_file) / len(per_file)
    assert avg_day <= 0.75 * day_span
    assert avg_ck <= 0.75 * ck_span
