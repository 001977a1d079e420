"""CUSUM changepoint semantics: the window-closed-form operator must
equal the textbook recursion S⁺_t = max(0, S⁺_{t-1} + d_t).

Closed-form proof sketch (the induction the operator's docstring cites):
with C_t = Σ_{i≤t} d_i and m_t = min_{0≤j≤t} C_j (C_0 = 0), claim
S_t = C_t − m_t. Base: S_0 = 0 = C_0 − m_0. Step: S_{t-1} + d_t =
C_t − m_{t-1}; if C_t ≥ m_{t-1} the max(0,·) keeps it and m_t = m_{t-1};
otherwise S_t = 0 and m_t = C_t — both match C_t − m_t. ∎

The test re-runs the recursion in Python over the engine's own dense
hourly series and exact integer parameters, so any drift in the closed
form, the densify, or the scaled-int discipline shows as a value diff.
"""

from __future__ import annotations

from collections import defaultdict
from decimal import ROUND_HALF_UP, Decimal

from conftest import SF_SMALL

from spark_deal_observer_spark.operators.intervals import (
    CUSUM_H_SIGMA,
    event_cusum_changepoint,
)
from spark_deal_observer_spark.sources.tables import load_table


def test_closed_form_equals_recursion(spark):
    events = load_table(spark, SF_SMALL, "events")
    rows = sorted(
        event_cusum_changepoint(events).collect(),
        key=lambda r: (r.event_type, r.bucket_ts),
    )
    assert rows

    # Reconstruct the exact integer parameters from the output itself:
    # cusum values are k/(2e6) rationals, so scale back losslessly.
    series = defaultdict(list)
    for r in rows:
        series[r.event_type].append(r)

    alarms = 0
    for etype, rs in series.items():
        xs = [r.n_events for r in rs]
        n = len(xs)
        sx, sxx = sum(xs), sum(x * x for x in xs)
        # HALF_UP like Spark's F.round (BigDecimal.valueOf(double) sees the
        # shortest decimal repr, same as Python repr) — Python round() is
        # banker's and would spuriously fail on an exact 6-dp half-tie.
        def _r6(v: float) -> float:
            return float(
                Decimal(repr(v)).quantize(Decimal("0.000001"), ROUND_HALF_UP)
            )

        mu6 = _r6(sx / n)
        sig6 = _r6((n * sxx - sx * sx) ** 0.5 / n)
        mu_i = int(
            Decimal(repr(mu6 * 1_000_000)).quantize(Decimal("1"), ROUND_HALF_UP)
        )
        sig_i = int(
            Decimal(repr(sig6 * 1_000_000)).quantize(Decimal("1"), ROUND_HALF_UP)
        )
        sp = sn = 0
        for r, x in zip(rs, xs):
            d2 = 2_000_000 * x - 2 * mu_i - sig_i
            e2 = 2 * mu_i - 2_000_000 * x - sig_i
            sp = max(0, sp + d2)
            sn = max(0, sn + e2)
            assert r.cusum_pos == sp / 2_000_000, (etype, r.bucket_ts)
            assert r.cusum_neg == sn / 2_000_000, (etype, r.bucket_ts)
            assert r.alarm_pos == (sp > 2 * CUSUM_H_SIGMA * sig_i)
            assert r.alarm_neg == (sn > 2 * CUSUM_H_SIGMA * sig_i)
            alarms += int(r.alarm_pos) + int(r.alarm_neg)

        # densified: the hourly grid has no gaps
        hours = [r.bucket_ts for r in rs]
        assert all(
            (b - a).total_seconds() == 3600 for a, b in zip(hours, hours[1:])
        ), etype

    # the uniform synthetic series should not be one long alarm — if every
    # bucket alarms, the threshold arithmetic is broken, not the data
    assert alarms < len(rows) / 2
