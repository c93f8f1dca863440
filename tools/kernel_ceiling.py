"""Workload-representative scaling ceiling: the pipeline's own extract
kernel, no Spark.

The integer-spin ceiling in scaling_run.hardware_ratio is cache-resident
arithmetic — it measures how CPU TIME scales from N to 4N pinned
processes but is blind to the resources a real decode+FFT workload
shares across cores: DRAM bandwidth and last-level cache. The measured
full-pipeline runs lose per-core throughput going 2->8 cores with <0.5%
hypervisor steal, which the spin ceiling (3.4-4.2x) cannot explain.

This tool runs the EXACT per-batch extract kernel the Spark stage ships
(`stages.extract.make_extract_fn`: decode, PSNR roundtrip invariant,
column profiles, rfft, peak picking, landmark + tile hashing, MinHash /
SimHash / substring fingerprints) in plain multiprocessing workers
pinned to the same CPU sets as the measured runs — zero Spark, zero
shuffle, zero JVM. Its N->4N throughput ratio is therefore the ceiling
the VM's memory subsystem imposes on THIS workload; any gap between it
and the Spark pipeline's measured ratio is the part the engine's
dataflow (shuffles, stage barriers, driver sync) actually owns.

On a real cluster the N->4N criterion multiplies NODES — DRAM channels
and LLC scale 4x along with the cores — so this single-box confounder
does not exist there (ceiling ~1.0, matching the north rule's framing).

Usage: python tools/kernel_ceiling.py [--n 2] [--seconds 45]
                                      [--batch 48] [--json]
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import sys
import time

for _v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _worker(args: tuple[int, int, float]) -> int:
    """Run the extract kernel on a private synthetic batch until the
    shared deadline; returns images processed. Content differs per
    worker (seeded by index) so no page-cache aliasing between them."""
    idx, batch_size, t_end = args
    import numpy as np

    from panako_spark.config import PanakoConfig
    from panako_spark.data.synth import generate_corpus, rows_to_pandas
    from panako_spark.stages.extract import make_extract_fn

    rows, _ = generate_corpus(batch_size, dup_fraction=0.3, seed=1000 + idx)
    pdf = rows_to_pandas(rows)
    pdf["iid"] = np.arange(len(pdf), dtype=np.int64)
    fn = make_extract_fn(PanakoConfig())
    done = 0
    while time.monotonic() < t_end:
        for out in fn(iter([pdf])):
            done += len(out)
    return done


def kernel_ratio(n: int, seconds: float = 45.0, batch: int = 48,
                 pin: bool = True) -> dict:
    out: dict = {"n_procs": n, "seconds": seconds, "batch": batch}
    prev = os.sched_getaffinity(0) if hasattr(os, "sched_getaffinity") else None
    for procs in (n, 4 * n):
        try:
            if pin and prev is not None:
                os.sched_setaffinity(0, set(range(procs)))
            with mp.Pool(procs) as p:
                # warm up imports/JITs outside the timed window
                p.map(_worker, [(i, 8, time.monotonic() + 0.1)
                                for i in range(procs)])
                t_end = time.monotonic() + seconds
                t0 = time.monotonic()
                counts = p.map(_worker, [(i, batch, t_end)
                                         for i in range(procs)])
                dt = time.monotonic() - t0
        finally:
            if pin and prev is not None:
                os.sched_setaffinity(0, prev)
        out[f"thr_{procs}"] = sum(counts) / dt
    out["ratio"] = out[f"thr_{4 * n}"] / out[f"thr_{n}"]
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2)
    ap.add_argument("--seconds", type=float, default=45.0)
    ap.add_argument("--batch", type=int, default=48)
    ap.add_argument("--json", action="store_true")
    ap.add_argument("--no-pin", action="store_true")
    args = ap.parse_args()
    r = kernel_ratio(args.n, args.seconds, args.batch, pin=not args.no_pin)
    if args.json:
        print(json.dumps(r))
    else:
        print(f"extract-kernel ceiling {args.n}->{4 * args.n} procs: "
              f"{r['ratio']:.2f}x  ({r[f'thr_{args.n}']:.1f} -> "
              f"{r[f'thr_{4 * args.n}']:.1f} img/s, ideal 4.0x)")


if __name__ == "__main__":
    main()
