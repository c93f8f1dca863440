"""Measure effective CPU frequency under k-core load — turbo-droop probe.

A 2-core-busy host often clocks its busy cores higher than an
8-core-busy host (all-core turbo < few-core turbo). That droop
depresses EVERY stage of an N->4N strong-scaling measurement uniformly
— compute- and shuffle-bound alike — and no software change can
recover it. On a real cluster the N->4N criterion multiplies nodes, so
every node runs the same all-core frequency at both cluster sizes and
the droop does not exist.

Method: pin `k` spinner processes to CPUs 0..k-1, spin a calibrated
integer loop, and report iterations/s per core (a software clock:
immune to /proc/cpuinfo MHz being virtualized or stale) plus the mean
/proc/cpuinfo MHz of the busy cores sampled mid-spin.

Usage: python tools/freq_probe.py [--levels 2,8] [--seconds 5] [--json]
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import time


def _spin_count(args: tuple[int, float]) -> int:
    cpu, t_end = args
    try:
        os.sched_setaffinity(0, {cpu})
    except OSError:
        pass
    x = 0
    n = 0
    while time.monotonic() < t_end:
        for _ in range(100000):
            x += 1
        n += 100000
    return n


def _cpuinfo_mhz(cpu_ids: set[int]) -> float:
    vals = []
    cur = -1
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("processor"):
                    cur = int(line.split(":")[1])
                elif line.startswith("cpu MHz") and cur in cpu_ids:
                    vals.append(float(line.split(":")[1]))
    except OSError:
        return float("nan")
    return sum(vals) / len(vals) if vals else float("nan")


def probe(k: int, seconds: float) -> dict:
    t_end = time.monotonic() + seconds
    with mp.Pool(k) as p:
        async_res = p.map_async(_spin_count,
                                [(i, t_end) for i in range(k)])
        time.sleep(seconds / 2)  # sample MHz mid-spin, under load
        mhz = _cpuinfo_mhz(set(range(k)))
        counts = async_res.get()
    per_core = sum(counts) / k / seconds
    return {"busy_cores": k, "iters_per_core_s": per_core,
            "cpuinfo_mhz_busy": round(mhz, 1)}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--levels", default="2,8")
    ap.add_argument("--seconds", type=float, default=5.0)
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()
    levels = [int(x) for x in args.levels.split(",")]
    out = {"levels": [probe(k, args.seconds) for k in levels]}
    if len(out["levels"]) == 2:
        a, b = out["levels"]
        out["per_core_ratio"] = round(
            b["iters_per_core_s"] / a["iters_per_core_s"], 4)
    print(json.dumps(out) if args.json else out)


if __name__ == "__main__":
    main()
