"""The canonical cross-engine ROUND(x, 6) oracle template.

Spark's ``F.round(double, 6)`` is ``BigDecimal.valueOf(d).setScale(6,
HALF_UP)`` — HALF_UP applied to the double's SHORTEST decimal repr
(``Double.toString``). DuckDB's ``ROUND(double, 6)`` rounds the raw binary
value instead, so the two legally disagree whenever the shortest repr
shows an exact 6-dp half-tie the binary value sits a hair off (the
exact-decimal-tie class the sf0.1 gate caught in r5/r6/r7).

History of oracle-side fixes:

- r6: ``CAST(ROUND(CAST(x AS DECIMAL(w,12)), 6) AS DOUBLE)`` — recovers
  the tie by rounding the double to 12 dp first. Correct for |x| below
  ~1e6, but the double→DECIMAL cast scales through inexact arithmetic at
  higher magnitudes and lands on the wrong side of the tie
  (tests/test_round_fuzz.py reproduces: 1000000.0078125 → …007812 vs
  Spark …007813). Width choice was also a per-site liability (the r6
  seasonal DECIMAL(18,12) overflow).

- r8 (this template): round the double's SHORTEST REPR itself. DuckDB's
  ``CAST(double AS VARCHAR)`` emits the shortest round-trip string (same
  value Java's ``Double.toString`` denotes), and parsing it into a wide
  decimal is exact — so ``ROUND(…, 6)`` applies HALF_UP to exactly the
  number Spark rounds, at ANY magnitude below 1e21 (the DECIMAL(38,17)
  integer capacity; beyond it the cast raises — loud, never silently
  wrong). Verified across exact-tie/near-tie/magnitude-ladder sweeps and
  both signs (incl. -0.0) by tests/test_round_fuzz.py.

Every oracle needing 6-dp parity must use :func:`round6_sql`;
tests/test_round_fuzz.py's inventory gate fails on any hand-rolled
``DECIMAL(w,12)`` template so the legacy form cannot creep back in.
"""

from __future__ import annotations

# {x} must denote the same DOUBLE the Spark side rounds; the inner cast
# normalizes integer/decimal-typed oracle expressions onto that double.
# The OUTPUT also exits via VARCHAR: DuckDB's direct DECIMAL(38,17)→DOUBLE
# cast converts hugeint-mantissa/10^17 with TWO float roundings and lands
# 1-2 ulp off past ~1e10 (found by the r8 magnitude-ladder fuzz), while
# decimal→VARCHAR is exact digits and VARCHAR→DOUBLE is correctly rounded
# — matching BigDecimal.doubleValue() on the Spark side.
ROUND6_SHORTEST = (
    "CAST(CAST(ROUND(CAST(CAST(CAST({x} AS DOUBLE) AS VARCHAR)"
    " AS DECIMAL(38,17)), 6) AS VARCHAR) AS DOUBLE)"
)


def round6_sql(x: str) -> str:
    """DuckDB expression equal to Spark ``F.round(CAST(x AS DOUBLE), 6)``."""
    return ROUND6_SHORTEST.format(x=x)
