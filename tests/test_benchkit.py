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


# ---------------------------------------------------------------------------
# Per-query foreign-CPU metering (VERDICT r7 item 2)
# ---------------------------------------------------------------------------


def test_cpu_snapshot_monotone():
    import time as _t

    b1 = benchkit.cpu_snapshot()
    t0 = _t.process_time()
    while _t.process_time() - t0 < 0.2:  # burn ~0.2 s in THIS process
        pass
    b2 = benchkit.cpu_snapshot()
    assert b2[0] >= b1[0] and b2[1] >= b1[1]
    # own burn is in the tree, so foreign stays near zero
    assert b2[1] - b1[1] >= 0.15


def test_own_subprocess_is_not_foreign():
    """A busy CHILD (like the Spark JVM / pyspark workers) must be
    attributed to the own tree, not to foreign contention."""
    import subprocess

    before = benchkit.cpu_snapshot()
    subprocess.run(
        ["python", "-c",
         "import time;t0=time.process_time()\n"
         "while time.process_time()-t0<0.5: pass"],
        check=True,
    )
    after = benchkit.cpu_snapshot()
    foreign = benchkit.foreign_between(before, after)
    own = after[1] - before[1]
    assert own >= 0.4, own  # the child's burn landed in the tree
    # kernel noise only; on a 32-core box 5% capacity over ~1 s is 1.6 s
    assert foreign < 0.05 * (benchkit.os.cpu_count() or 1) * 1.0, foreign


def test_foreign_between_floors_at_zero():
    assert benchkit.foreign_between((10.0, 4.0), (10.5, 5.0)) == 0.0


def test_descendant_reaped_by_live_intermediate_is_not_foreign():
    """r8 ADVICE #4: a short-lived worker reaped by a still-running
    intermediate (the pyspark daemon pattern) must land in the own tree
    via the intermediate's cutime, not inflate foreign CPU."""
    import subprocess
    import time as _t

    before = benchkit.cpu_snapshot()
    # intermediate: spawns + REAPS a grandchild that burns ~0.5 s, then
    # stays alive so its cutime (not ours) holds the grandchild's CPU
    inter = subprocess.Popen(
        ["python", "-c",
         "import subprocess,time\n"
         "subprocess.run(['python','-c',"
         "'import time;t0=time.process_time()\\n"
         "while time.process_time()-t0<0.5: pass'], check=True)\n"
         "time.sleep(30)"],
    )
    try:
        deadline = _t.time() + 20
        while _t.time() < deadline:
            after = benchkit.cpu_snapshot()
            if (after[1] - before[1]) >= 0.4:  # grandchild burn attributed
                break
            _t.sleep(0.2)
        own = after[1] - before[1]
        foreign = benchkit.foreign_between(before, after)
        assert own >= 0.4, own
        assert foreign < 0.05 * (benchkit.os.cpu_count() or 1) * 1.0, foreign
    finally:
        inter.kill()
        inter.wait()
