"""Contention guard for perf artifacts (VERDICT r6 item 1).

BENCH_DETAIL.json once carried a 3× inflated warm number because the
refresh ran on a loaded box. These tests pin the guard semantics all
three measurement scripts share: refuse-or-flag on a busy box, and a
`contaminated` stamp a reader can check inside the artifact itself.
"""

from __future__ import annotations

import pytest

from spark_deal_observer_spark import benchkit


def test_idle_box_passes_immediately(monkeypatch):
    monkeypatch.setattr(benchkit, "load_1m", lambda: 0.4)
    load, waited = benchkit.guard_load(wait_s=0.0, refuse=True, label="t")
    assert load == 0.4
    assert waited == 0.0


def test_busy_box_refuses_when_asked(monkeypatch):
    monkeypatch.setattr(benchkit, "load_1m", lambda: 9.0)
    with pytest.raises(SystemExit):
        benchkit.guard_load(wait_s=0.0, refuse=True, label="t")


def test_busy_box_proceeds_with_flag_for_driver_bench(monkeypatch):
    # The driver-run bench must still emit an artifact — it proceeds, and
    # the loadstamp marks the result contaminated.
    monkeypatch.setattr(benchkit, "load_1m", lambda: 9.0)
    load, waited = benchkit.guard_load(wait_s=0.0, refuse=False, label="t")
    stamp = benchkit.loadstamp(load, waited_s=waited)
    assert stamp["contaminated"] is True
    assert stamp["load_1m_start"] == 9.0


def test_guard_waits_for_load_to_drain(monkeypatch):
    readings = iter([5.0, 5.0, 0.5, 0.5])
    monkeypatch.setattr(benchkit, "load_1m", lambda: next(readings))
    monkeypatch.setattr(benchkit.time, "sleep", lambda s: None)
    load, waited = benchkit.guard_load(wait_s=60.0, refuse=True, label="t")
    assert load == 0.5
    assert waited == 20.0


def test_force_env_skips_guard(monkeypatch):
    monkeypatch.setattr(benchkit, "load_1m", lambda: 9.0)
    monkeypatch.setenv("SPARK_GRAFT_BENCH_FORCE", "1")
    load, waited = benchkit.guard_load(wait_s=0.0, refuse=True, label="t")
    assert waited == 0.0
    # ...but the stamp still tells the truth about the conditions.
    assert benchkit.loadstamp(load)["contaminated"] is True


def test_loadstamp_idle_is_clean(monkeypatch):
    monkeypatch.setattr(benchkit, "load_1m", lambda: 0.3)
    stamp = benchkit.loadstamp(0.2, waited_s=0.0)
    assert stamp["contaminated"] is False
    assert stamp["load_1m_end"] == 0.3
