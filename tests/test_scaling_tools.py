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


def _row(mode, level, thr_img, steal, pair=None, thr_at_write=None):
    r = {"mode": mode, "level": level, "images_per_sec": thr_img,
         "steal_pct": steal, "pinned_cpus": f"0-{level - 1}"}
    if pair is not None:
        r["protocol_pair"] = list(pair)
    if thr_at_write is not None:
        r["steal_threshold_at_write"] = thr_at_write
    return r


def _write_jsonl(tmp_path, rows):
    import json

    p = tmp_path / "runs.jsonl"
    p.write_text("".join(json.dumps(r) + "\n" for r in rows))
    return str(p)


def test_clean_eff_phrase_pairs_by_protocol_tag(tmp_path, monkeypatch):
    """ADVICE r3: overlapping protocols ({1,4} and {4,16}) must not
    mispair — tagged rows pair only within their own protocol, and each
    row is gated by ITS OWN write-time threshold, not the caller's."""
    import scaling_run as SR

    rows = [
        # protocol (1,4): one clean pair, eff = 40/10/4 = 1.0
        _row("full", 1, 10.0, 0.1, pair=(1, 4), thr_at_write=5.0),
        _row("full", 4, 40.0, 0.2, pair=(1, 4), thr_at_write=5.0),
        # protocol (4,16): a level-4 row that adjacency pairing would
        # have glued onto the (1,4) history
        _row("full", 4, 42.0, 0.1, pair=(4, 16), thr_at_write=5.0),
        _row("full", 16, 100.0, 0.3, pair=(4, 16), thr_at_write=5.0),
        # a (1,4) pair recorded under a STRICTER write-time gate: its
        # 3% steal leg was contaminated THEN and must stay excluded
        # even when the caller's current threshold is looser
        _row("full", 1, 10.0, 3.0, pair=(1, 4), thr_at_write=1.0),
        _row("full", 4, 20.0, 0.2, pair=(1, 4), thr_at_write=1.0),
    ]
    monkeypatch.setattr(SR, "RUNS_JSONL", _write_jsonl(tmp_path, rows))
    p14 = SR._clean_eff_phrase("full", 1, 4, 5.0)
    assert "1 clean pair(s)" in p14 and "1.000" in p14
    assert "no ceiling normalization needed" in p14
    p416 = SR._clean_eff_phrase("full", 4, 16, 5.0)
    assert "1 clean pair(s)" in p416 and "0.595" in p416
    # sub-0.8 pair: the unconditional claim must NOT appear
    assert "no ceiling normalization needed" not in p416
    assert "ceiling normalization" in p416
    assert SR._level_pairs_in_log("full") == [(1, 4), (4, 16)]


def test_clean_eff_phrase_legacy_rows_use_adjacency(tmp_path, monkeypatch):
    """Untagged (pre-round-4) rows keep the old adjacency pairing and
    the caller's threshold, so recorded history stays readable."""
    import scaling_run as SR

    rows = [_row("store", 2, 10.0, 0.1), _row("store", 8, 36.0, 0.2)]
    monkeypatch.setattr(SR, "RUNS_JSONL", _write_jsonl(tmp_path, rows))
    ph = SR._clean_eff_phrase("store", 2, 8, 5.0)
    assert "1 clean pair(s)" in ph and "0.900" in ph
    assert SR._level_pairs_in_log("store") == [(2, 8)]
