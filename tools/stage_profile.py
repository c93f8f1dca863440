"""Per-stage scaling diagnosis from Spark event logs.

The N->4N run records show the full pipeline consuming ~28% MORE busy
core-seconds at local[8] than at local[2] for the same input (6853 vs
5367 core-s at 69.7k images) while cores stay 94-99% busy at both
levels — i.e. the scaling loss is WORK INFLATION, not idle cores or a
serial driver term. The pure-ALU frequency probe shows only ~1.2%
all-core droop 2->8, so most of the inflation is workload-specific
(memory-bandwidth stalls, GC, spill, shuffle codec work). This tool
localizes it: run the identical pipeline at both levels with
`bench.py --event-log`, then aggregate per-stage task metrics
(executorRunTime, executorCpuTime, jvmGcTime, spill, shuffle bytes)
and print a side-by-side table sorted by core-second inflation.

Usage:
    python tools/stage_profile.py --n-base 8000 [--levels 2,8]
    python tools/stage_profile.py --parse-only /tmp/evlog_2 /tmp/evlog_8
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import subprocess
import sys
from collections import defaultdict

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _event_lines(d: str):
    """Yield event-JSON lines from the newest app log under d — handles
    both the single-file format and the eventlog_v2 rolling directory
    (events_*.zstd parts)."""
    entries = sorted(glob.glob(os.path.join(d, "*")), key=os.path.getmtime)
    entries = ([e for e in entries if not e.endswith(".inprogress")]
               or entries)
    path = entries[-1]
    parts = (sorted(glob.glob(os.path.join(path, "events_*")))
             if os.path.isdir(path) else [path])
    for p in parts:
        if p.endswith(".zstd"):
            import pyarrow as pa

            codec = pa.Codec("zstd")
            # spark writes a zstd stream; pyarrow decompresses buffers,
            # so stream-decode via the stdlib-free CompressedInputStream
            with pa.CompressedInputStream(pa.OSFile(p, "rb"),
                                          "zstd") as f:
                data = f.read()
            del codec
            for line in data.decode("utf-8", "replace").splitlines():
                yield line
        else:
            with open(p) as f:
                yield from f


def parse_event_log(d: str) -> dict:
    """Aggregate task metrics per stage from the newest app log in d."""
    stages: dict[int, dict] = defaultdict(lambda: defaultdict(float))
    names: dict[int, str] = {}
    sql_desc: dict[int | None, str] = {}
    if True:
        for line in _event_lines(d):
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            e = ev.get("Event")
            if e and e.endswith("SparkListenerSQLExecutionStart"):
                sql_desc[ev.get("executionId")] = (
                    ev.get("description") or "?").split("\n")[0][:70]
            elif e == "SparkListenerJobStart":
                props = ev.get("Properties") or {}
                eid = props.get("spark.sql.execution.id")
                cs = (sql_desc.get(int(eid)) if eid is not None else None) \
                    or props.get("spark.job.description") \
                    or props.get("callSite.short") or "?"
                for sid in ev.get("Stage IDs", []):
                    names.setdefault(sid, cs.split("\n")[0][:70])
            elif e == "SparkListenerStageSubmitted":
                si = ev["Stage Info"]
                names.setdefault(si["Stage ID"],
                                 si["Stage Name"].split("\n")[0])
            elif e == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                tm = ev.get("Task Metrics") or {}
                s = stages[sid]
                s["tasks"] += 1
                s["run_ms"] += tm.get("Executor Run Time", 0)
                s["cpu_ms"] += tm.get("Executor CPU Time", 0) / 1e6
                s["gc_ms"] += tm.get("JVM GC Time", 0)
                s["deser_ms"] += tm.get("Executor Deserialize Time", 0)
                s["result_ser_ms"] += tm.get("Result Serialization Time", 0)
                s["mem_spill"] += tm.get("Memory Bytes Spilled", 0)
                s["disk_spill"] += tm.get("Disk Bytes Spilled", 0)
                sw = tm.get("Shuffle Write Metrics") or {}
                s["shuf_w_bytes"] += sw.get("Shuffle Bytes Written", 0)
                s["shuf_w_ms"] += sw.get("Shuffle Write Time", 0) / 1e6
                sr = tm.get("Shuffle Read Metrics") or {}
                s["shuf_r_bytes"] += (sr.get("Local Bytes Read", 0)
                                      + sr.get("Remote Bytes Read", 0))
                s["shuf_fetch_ms"] += sr.get("Fetch Wait Time", 0)
                inp = tm.get("Input Metrics") or {}
                s["input_bytes"] += inp.get("Bytes Read", 0)
                out = tm.get("Output Metrics") or {}
                s["output_bytes"] += out.get("Bytes Written", 0)
    return {"stages": dict(stages), "names": names}


def _bucket(name: str) -> str:
    """Collapse job callsites into comparable buckets across levels
    (stage IDs differ run to run; callsites are stable)."""
    return name[:44]


def summarize(parsed: dict) -> dict:
    by_bucket: dict[str, dict] = defaultdict(lambda: defaultdict(float))
    for sid, s in parsed["stages"].items():
        b = _bucket(parsed["names"].get(sid, f"stage{sid}"))
        for k, v in s.items():
            by_bucket[b][k] += v
    return dict(by_bucket)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-base", type=int, default=8000)
    ap.add_argument("--levels", default="2,8")
    ap.add_argument("--parse-only", nargs="*", default=None,
                    help="skip the runs; parse these event-log dirs")
    args = ap.parse_args()
    levels = [int(x) for x in args.levels.split(",")]

    dirs = args.parse_only
    if not dirs:
        dirs = []
        for lv in levels:
            d = f"/tmp/evlog_{lv}"
            import shutil
            shutil.rmtree(d, ignore_errors=True)
            os.makedirs(d, exist_ok=True)
            cmd = ["taskset", "-c", f"0-{lv - 1}", sys.executable,
                   os.path.join(REPO, "bench.py"), "--skip-tables",
                   "--cpus", str(lv), "--n-base", str(args.n_base),
                   "--mode", "full", "--event-log", d]
            env = dict(os.environ, SPARK_DRIVER_MEMORY="48g")
            print(f"running local[{lv}] n_base={args.n_base} ...",
                  flush=True)
            r = subprocess.run(cmd, capture_output=True, text=True,
                               cwd=REPO, env=env, timeout=5400)
            for line in r.stdout.splitlines():
                if line.strip().startswith("{"):
                    j = json.loads(line)
                    print(f"  local[{lv}]: {j['value']}s "
                          f"{j.get('images_per_sec')} img/s "
                          f"stages={j.get('stages')}", flush=True)
            if r.returncode != 0:
                print(r.stderr[-2000:])
                sys.exit(1)
            dirs.append(d)

    sums = [summarize(parse_event_log(d)) for d in dirs]
    allb = sorted(set().union(*[s.keys() for s in sums]),
                  key=lambda b: -max(s.get(b, {}).get("run_ms", 0)
                                     for s in sums))
    hdr = (f"{'bucket':<30} " + "".join(
        f"| run_s({lv}) cpu_s gc_s spillMB shufMB "
        for lv in levels) + "| infl")
    print(hdr)
    print("-" * len(hdr))
    tot = [defaultdict(float) for _ in sums]
    for b in allb:
        row = f"{b:<30} "
        vals = []
        for i, s in enumerate(sums):
            m = s.get(b, {})
            for k, v in m.items():
                tot[i][k] += v
            run_s = m.get("run_ms", 0) / 1e3
            vals.append(run_s)
            row += (f"| {run_s:9.1f} {m.get('cpu_ms', 0) / 1e3:5.0f} "
                    f"{m.get('gc_ms', 0) / 1e3:4.0f} "
                    f"{(m.get('mem_spill', 0) + m.get('disk_spill', 0)) / 1e6:7.0f} "
                    f"{(m.get('shuf_w_bytes', 0)) / 1e6:6.0f} ")
        infl = vals[-1] / vals[0] if vals[0] > 0 else float("inf")
        print(row + f"| {infl:5.2f}")
    row = f"{'TOTAL':<30} "
    vals = []
    for i in range(len(sums)):
        m = tot[i]
        run_s = m.get("run_ms", 0) / 1e3
        vals.append(run_s)
        row += (f"| {run_s:9.1f} {m.get('cpu_ms', 0) / 1e3:5.0f} "
                f"{m.get('gc_ms', 0) / 1e3:4.0f} "
                f"{(m.get('mem_spill', 0) + m.get('disk_spill', 0)) / 1e6:7.0f} "
                f"{(m.get('shuf_w_bytes', 0)) / 1e6:6.0f} ")
    print(row + f"| {vals[-1] / vals[0] if vals[0] else 0:5.2f}")


if __name__ == "__main__":
    main()
