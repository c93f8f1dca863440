"""Unit coverage for the scaling harness's measurement primitives.

The N->4N evidence (BENCH/BASELINE.md) hangs off these counters, so
their scoping rules are pinned here: a PINNED run must be judged only
by its own CPU set's steal/busy ticks (hypervisor steal accrues per
vCPU; activity on disjoint cores is irrelevant to the run).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

from scaling_run import _cpu_counters  # noqa: E402


def test_aggregate_counters_monotone_nonnegative():
    s, b, t = _cpu_counters(None)
    assert s >= 0 and 0 < b <= t
    s2, b2, t2 = _cpu_counters(None)
    assert s2 >= s and b2 >= b and t2 >= t


def test_scoped_counters_subset_of_aggregate():
    n = os.cpu_count()
    s_all, b_all, t_all = _cpu_counters(set(range(n)))
    s_01, b_01, t_01 = _cpu_counters({0, 1})
    # two cores are a strict subset of the machine
    assert s_01 <= s_all and b_01 <= b_all and t_01 < t_all
    # and per-cpu tick totals are ~uniform: 2 cores ~= 2/n of the total
    assert abs(t_01 / t_all - 2 / n) < 0.01


def test_scoped_counters_additive_over_partition():
    n = os.cpu_count()
    lo = _cpu_counters(set(range(n // 2)))
    hi = _cpu_counters(set(range(n // 2, n)))
    all_ = _cpu_counters(set(range(n)))
    # ticks advance between reads, so allow slack of a few ticks/cpu
    for a, b, tot in zip(lo, hi, all_):
        assert 0 <= tot - (a + b) <= 4 * n


def test_disjoint_activity_does_not_move_scoped_busy():
    """Burn CPU on one allowed core; a DIFFERENT idle core's scoped busy
    delta must not absorb it (the round-3 gate bug this pins: host-wide
    busy-relative steal charged pinned runs for other cores' work).
    Both cores are picked from this process's own affinity mask so the
    test coexists with concurrently pinned jobs on other cores."""
    import time

    allowed = sorted(os.sched_getaffinity(0))
    assert len(allowed) >= 2, "needs two schedulable CPUs"
    watch, burn = allowed[-2], allowed[-1]
    s0, b0, t0 = _cpu_counters({watch})
    sB, bB, tB = _cpu_counters({burn})
    prev = os.sched_getaffinity(0)
    try:
        os.sched_setaffinity(0, {burn})
        t_end = time.monotonic() + 1.0
        x = 0
        while time.monotonic() < t_end:
            x += 1
    finally:
        os.sched_setaffinity(0, prev)
    s1, b1, t1 = _cpu_counters({watch})
    sB1, bB1, tB1 = _cpu_counters({burn})
    burned = bB1 - bB
    leaked = b1 - b0
    assert burned >= 50, burned                 # ~1s at 100Hz minus noise
    assert leaked <= burned / 2, (leaked, burned)
