"""Memory-bandwidth ceiling probe (companion to the spin-loop frequency
probe in scaling_run.py).

The spin loop is register-resident, so it measures only clock/steal
effects (flat 2->8 busy cores on this VM). Spark's shuffle/sort/join
tasks are memory-bound; if the host's aggregate DRAM bandwidth saturates
below 8 cores' demand, per-core task CPU-seconds inflate with busy-core
count even though the clock is flat — exactly the signature the
per-stage event-log profile shows (tools/stage_profile.py). This probe
measures it directly: a STREAM-triad-like NumPy kernel (a = b + s*c
over arrays far larger than LLC) run at 1, 2, 8, and 32 concurrent
pinned processes, reporting per-process and aggregate GB/s.

Usage: python tools/bandwidth_probe.py [--levels 1,2,8,32]
Writes JSON to stdout (and /tmp/bandwidth_probe.json).
"""
from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import time

N = 40_000_000  # 3 arrays x 8 B x 40 M = 960 MB footprint per process


def _triad(idx: int) -> float:
    """Return achieved GB/s for one process over ~4 s of triad sweeps."""
    try:
        # pin to the idx-th CPU of the INHERITED mask so `taskset -c`
        # on the parent confines the whole probe (and a bench pinned
        # elsewhere on the host is never touched)
        allowed = sorted(os.sched_getaffinity(0))
        os.sched_setaffinity(0, {allowed[idx % len(allowed)]})
    except OSError:
        pass
    import numpy as np

    b = np.ones(N)
    c = np.ones(N)
    a = np.empty(N)
    # warm-up sweep faults the pages in
    np.multiply(c, 2.0, out=a)
    t_end = time.monotonic() + 4.0
    sweeps = 0
    t0 = time.monotonic()
    while time.monotonic() < t_end:
        np.multiply(c, 2.0, out=a)
        a += b
        sweeps += 1
    dt = time.monotonic() - t0
    # per sweep: read b, read c, write a (+RFO read of a) ~ 4 arrays moved
    return sweeps * 4 * N * 8 / dt / 1e9


def measure(procs: int) -> dict:
    with mp.Pool(procs) as p:
        rates = p.map(_triad, range(procs))
    return {"procs": procs,
            "per_proc_gbs": round(sum(rates) / len(rates), 2),
            "aggregate_gbs": round(sum(rates), 2)}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--levels", default="1,2,8,32")
    args = ap.parse_args()
    out = [measure(int(x)) for x in args.levels.split(",")]
    base = out[0]["per_proc_gbs"]
    for row in out:
        row["per_proc_vs_1"] = round(row["per_proc_gbs"] / base, 3)
    js = json.dumps({"triad_n_doubles": N, "levels": out})
    print(js)
    with open("/tmp/bandwidth_probe.json", "w") as f:
        f.write(js)


if __name__ == "__main__":
    main()
