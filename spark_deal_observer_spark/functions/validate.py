"""Schema + constraint enforcement: the reference's runtime validation layer.

The reference validates every row at every boundary with TypeBox
(`Value.Parse(ActiveDealDbEntry, deal)`, deal-observer.js:140; types at
db/lib/types.js:12-31) and rejects unknown event types (service.js:80-82).
In Spark the StructType is already enforced at scan time, so the engine's
job splits into:

  * `require_schema` — the P7 typed scan: fail fast when a DataFrame's
    shape drifts from the declared StructType (names, types, extra or
    missing columns). A metadata check — free at any scale.
  * `enforce_constraints` — the CHECK-constraint analog for what parquet
    can't express: enum domains, NOT NULL on logical (not physical)
    requirements, cross-column invariants. One codegen'd filter pass
    splitting rows into (valid, violations) — the PERMISSIVE/badRecordsPath
    pattern for already-structured data.

NULL↔undefined normalization (F14, deal-observer.js:134-139) needs no code:
nullable StructType fields are the single representation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from ..operators.state import NOT_QUERIED, RESOLVED, TERMINAL, UNRESOLVED

PAYLOAD_STATES = (NOT_QUERIED, RESOLVED, UNRESOLVED, TERMINAL)


class SchemaMismatch(ValueError):
    pass


def require_schema(df: DataFrame, expected: StructType, *, allow_extra: bool = False) -> DataFrame:
    """Assert `df` structurally matches `expected`; returns `df` selected in
    the declared column order (so downstream code can rely on position)."""
    actual = {f.name: f.dataType for f in df.schema.fields}
    problems = []
    for f in expected.fields:
        if f.name not in actual:
            problems.append(f"missing column {f.name!r}")
        elif actual[f.name] != f.dataType:
            problems.append(
                f"column {f.name!r}: expected {f.dataType.simpleString()}, "
                f"got {actual[f.name].simpleString()}"
            )
    if not allow_extra:
        extra = set(actual) - {f.name for f in expected.fields}
        if extra:
            problems.append(f"unexpected columns {sorted(extra)}")
    if problems:
        raise SchemaMismatch("; ".join(problems))
    return df.select(*[f.name for f in expected.fields])


def enforce_constraints(
    df: DataFrame, checks: dict[str, Column]
) -> tuple[DataFrame, DataFrame]:
    """Split rows into (valid, violations) by named CHECK predicates.

    Violations carry a `violated` array column naming every failed check —
    the analyzable dead-letter shape. Single pass, pure column expressions."""
    tagged = df.withColumn(
        "violated",
        F.filter(
            F.array(
                *[F.when(~cond, F.lit(name)) for name, cond in checks.items()]
            ),
            lambda x: x.isNotNull(),
        ),
    )
    valid = tagged.where(F.size("violated") == 0).drop("violated")
    violations = tagged.where(F.size("violated") > 0)
    return valid, violations


def deal_constraints() -> dict[str, Column]:
    """The active_deals CHECK set implied by the migrations (002..011):
    NOT NULLs, the state enum domain, and the term invariant."""
    return {
        "state_in_enum": F.col("payload_retrievability_state").isin(*PAYLOAD_STATES),
        "piece_cid_not_null": F.col("piece_cid").isNotNull(),
        "piece_size_positive": F.col("piece_size") > 0,
        "term_min_le_max": F.col("term_min") <= F.col("term_max"),
        "reverted_not_null": F.col("reverted").isNotNull(),
    }
