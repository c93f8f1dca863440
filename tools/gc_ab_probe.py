"""A/B/A probe for driver-JVM GC configs on the pinned bench protocol.

The ParallelGC switch (commit 70193a9) was measured on the full-mode
profile and shipped on +37%/+47% at local[2]/[8] — but the first
post-switch STORE pair showed the L8 leg collapsing 594-648 ->
273 img/s with task GC time 1.5-3.3 s -> 59 s. A slower base leg
inflates the 8->32 ratio, which is exactly the Fix-4 anti-pattern, so
the GC choice must be re-decided on same-window A/B evidence at BOTH
modes before any more protocol pairs are recorded.

Runs each labeled config at one (mode, level, n_base) point, configs
interleaved round-robin (A,B,C,A,B,C) so window drift decorrelates
from config, each run gated on a pre-flight steal probe. Appends one
JSON line per run to BENCH/gc_ab_probe.jsonl.

Usage:
    python tools/gc_ab_probe.py --mode store --cpus 8 --n-base 48000 \
        --rounds 2
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))
from scaling_run import _steal_probe, wait_for_quiet  # noqa: E402

BASE = "-Djava.security.manager=allow"
CONFIGS = {
    # shipping config before 70193a9
    "g1": BASE,
    # shipping config at HEAD
    "pgc": BASE + " -XX:+UseParallelGC",
    # candidate: ParallelGC with the heap pre-sized (Spark only sets
    # -Xmx; ParallelGC grows the heap through stop-the-world full GCs)
    "pgc_xms": BASE + " -XX:+UseParallelGC -Xms48g",
    # candidate: G1 with the heap pre-sized
    "g1_xms": BASE + " -Xms48g",
    # candidate: G1, pre-sized, 32m regions so multi-MB Arrow batches
    # stop being humongous allocations (the failure mode the profile
    # blamed for full-mode GC inflation)
    "g1_region": BASE + " -Xms48g -XX:G1HeapRegionSize=32m",
}

OUT = os.path.join(REPO, "BENCH", "gc_ab_probe.jsonl")


def run_one(tag: str, opts: str, mode: str, cpus: int, n_base: int,
            steal_threshold: float) -> dict | None:
    env = dict(os.environ, SPARK_DRIVER_MEMORY="48g")
    cmd = ["taskset", "-c", f"0-{cpus - 1}", sys.executable,
           os.path.join(REPO, "bench.py"), "--skip-tables",
           "--no-quiet-wait", "--cpus", str(cpus),
           "--n-base", str(n_base), "--mode", mode,
           "--conf", f"spark.driver.extraJavaOptions={opts}"]
    t0 = time.time()
    try:
        out = subprocess.run(cmd, capture_output=True, text=True,
                             timeout=7200, check=True, cwd=REPO, env=env)
    except (subprocess.CalledProcessError, subprocess.TimeoutExpired) as e:
        print(f"  {tag}: RUN FAILED {type(e).__name__}", flush=True)
        return None
    for line in out.stdout.splitlines():
        if line.strip().startswith("{"):
            r = json.loads(line)
            rec = {"tag": tag, "mode": mode, "cpus": cpus,
                   "n_base": n_base,
                   "images_per_sec": r["images_per_sec"],
                   "wall_s": r["value"],
                   "gc_ms": r.get("pipeline_gc_ms"),
                   "steal_pct": r.get("steal_pct"),
                   "stages": r.get("stages"),
                   "ts0": round(t0, 1)}
            with open(OUT, "a") as f:
                f.write(json.dumps(rec) + "\n")
            clean = (rec["steal_pct"] or 0) <= steal_threshold
            print(f"  {tag}: {rec['images_per_sec']} img/s, "
                  f"gc {rec['gc_ms']} ms, steal {rec['steal_pct']}%"
                  f"{'' if clean else ' CONTAMINATED'}", flush=True)
            return rec
    print(f"  {tag}: no JSON line", flush=True)
    return None


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="store")
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--n-base", type=int, default=48000)
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--configs", default="g1,pgc_xms,g1_region")
    ap.add_argument("--steal-threshold", type=float, default=3.0)
    ap.add_argument("--quiet-wait-s", type=float, default=900.0)
    args = ap.parse_args()
    tags = args.configs.split(",")
    for t in tags:
        if t not in CONFIGS:
            sys.exit(f"unknown config {t}; have {list(CONFIGS)}")
    for rnd in range(args.rounds):
        for tag in tags:
            probe = wait_for_quiet(args.steal_threshold,
                                   max_wait_s=args.quiet_wait_s)
            print(f"round {rnd} {tag}: pre-flight steal {probe:.1f}%",
                  flush=True)
            run_one(tag, CONFIGS[tag], args.mode, args.cpus,
                    args.n_base, args.steal_threshold)


if __name__ == "__main__":
    main()
