"""Off-Spark store-kernel scaling probe.

Runs bench.py's per-image store work — decode -> lossless re-encode
roundtrip + PSNR invariant -> extract_prints_with_tiles — in K pinned
worker PROCESSES (one per core, `os.sched_setaffinity`), no Spark, no
JVM, no Arrow. This isolates the KERNEL's N -> 4N core scaling from
everything the Spark harness adds per run (JVM startup, Python worker
spinup, task scheduling, parquet IO), answering the question the
store-mode pinned pairs alone cannot: when the bench ratio is low, is
the kernel hitting a hardware wall, or is the harness paying fixed
costs that a 10^12-row job amortizes to zero?

Levels run A-B-A (small, big, small again) so same-window drift
(turbo droop, co-tenant DRAM traffic) shows up as a spread between
the two small legs instead of silently biasing the ratio.

Output: one JSON line per level plus a summary ratio, e.g.

    python tools/kernel_scaling_probe.py --n 8          # 8 -> 32
    python tools/kernel_scaling_probe.py --n 2          # 2 -> 8

Measured 2026-08-19 (commit 894007c, N_IMG=2400, reps=2):
8 procs 655.8-685.3 img/s, 32 procs 1646.7 img/s -> raw 2.46x
(eff 0.61) against a same-window pure-CPU startup-probe ceiling of
3.11x (vs-ceiling 0.79). The 2.46x EXCEEDS the measured 8->32
STREAM-triad DRAM ceiling of 1.39x (BENCH/bandwidth_probe.json), so
the store kernel is NOT memory-streaming-bound at 32 procs — the
round-4 bandwidth-saturation attribution does not survive the
round-5 kernel rewrite (2.2x fewer cycles and bytes per image).
"""
from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _worker(args):
    k, nproc, n_img, reps = args
    os.sched_setaffinity(0, {k})
    from panako_spark.config import PanakoConfig
    from panako_spark.data.synth import generate_corpus
    from panako_spark.kernels import codec
    from panako_spark.kernels.landmarks import extract_prints_with_tiles

    cfg = PanakoConfig()
    rows, _ = generate_corpus(max(1, n_img // nproc), 0.3, seed=1000 + k)
    blobs = [(bytes(r.bytes), r.w, r.h, r.fmt) for r in rows]
    t0 = time.perf_counter()
    n = 0
    for _ in range(reps):
        for b, w, h, fmt in blobs:
            img = codec.decode(b, w, h, fmt)
            rt = codec.decode(codec.encode(img, fmt, level=1), w, h, fmt)
            codec.psnr(img, rt)
            extract_prints_with_tiles(codec.to_gray(img), cfg)
            n += 1
    return n, time.perf_counter() - t0


def run_level(nproc: int, n_img: int, reps: int) -> float:
    with mp.Pool(nproc) as p:
        t0 = time.perf_counter()
        res = p.map(_worker, [(k, nproc, n_img, reps) for k in range(nproc)])
        wall = time.perf_counter() - t0
    return sum(r[0] for r in res) / wall


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8, help="small level (big=4N)")
    ap.add_argument("--n-img", type=int, default=2400)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()
    small, big = args.n, args.n * 4
    thr = {}
    for tag, nproc in (("small_a", small), ("big", big), ("small_b", small)):
        thr[tag] = run_level(nproc, args.n_img, args.reps)
        print(json.dumps({"level": nproc, "leg": tag,
                          "images_per_sec": round(thr[tag], 1)}), flush=True)
    base = (thr["small_a"] + thr["small_b"]) / 2
    ratio = thr["big"] / base
    print(json.dumps({
        "metric": f"store kernel (no Spark) {small}->{big} procs",
        "speedup": round(ratio, 3),
        "raw_efficiency": round(ratio / 4.0, 3),
        "small_spread_pct": round(
            abs(thr["small_a"] - thr["small_b"]) / base * 100, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
