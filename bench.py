"""Benchmark driver (round contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] plus the image+caption
dedup pipeline on a deterministic synthetic corpus, and prints ONE JSON
line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...,
   "images_per_sec": ..., "n_images": ...}

Flags:
  --cpus N        override SPARK_GRAFT_CPUS for this run
  --n-base N      synthetic corpus size (default 600 base images)
  --skip-tables   only run the image pipeline (for scaling runs)
  --skip-pipeline only run the table queries
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

# one BLAS thread per Python worker: N workers already saturate N cores;
# nested numpy threading just oversubscribes and anti-scales
for _v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# headline table queries (subset of __spark_entry__.queries(): the ones that
# exercise shuffles/joins/windows at sf scale)
HEADLINE = [
    "stats_scan", "min_hits_gate", "topk_per_group", "near_hash_band_join",
    "resource_lookup_join", "coverage_histogram", "windowed_monitor",
    "token_count", "quality_score", "ngram_jaccard_pairs",
    "embedding_topk", "embedding_near_dup",
]


def bench_corpus_path(n_base: int) -> str:
    """Deterministic synthetic images parquet, cached across runs (same
    seed => same bytes), so scaling runs at two parallelism levels read
    identical input."""
    path = os.path.join(tempfile.gettempdir(),
                        f"panako_bench_corpus_v2_{n_base}")
    marker = os.path.join(path, "_SUCCESS_GEN")
    if not os.path.exists(marker):
        from panako_spark.data.synth import generate_corpus, rows_to_pandas
        import pyarrow as pa
        import pyarrow.parquet as pq

        rows, _ = generate_corpus(n_base, dup_fraction=0.3, seed=1234)
        pdf = rows_to_pandas(rows)
        shutil.rmtree(path, ignore_errors=True)
        os.makedirs(path, exist_ok=True)
        # MANY FILES, not one: a single parquet file yields only
        # size/128MB input splits and serializes the extract stage —
        # measured as local[32] running SLOWER than local[8]
        n_files = 64
        per = (len(pdf) + n_files - 1) // n_files
        for i in range(n_files):
            chunk = pdf.iloc[i * per:(i + 1) * per]
            if len(chunk):
                pq.write_table(pa.Table.from_pandas(chunk),
                               os.path.join(path, f"part-{i:03d}.parquet"),
                               row_group_size=64)
        with open(marker, "w") as f:
            f.write("ok")
    return path


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--n-base", type=int, default=600)
    ap.add_argument("--skip-tables", action="store_true")
    ap.add_argument("--skip-pipeline", action="store_true")
    ap.add_argument("--mode", choices=["full", "store"], default="full",
                    help="pipeline benchmark mode: 'full' = extract →"
                         " candidates → verify → cluster; 'store' ="
                         " extract + write prints/signatures only (the"
                         " reference's own store-throughput protocol)")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]

    from panako_spark.session import get_spark

    # shuffle partitions fixed across parallelism levels: scaling runs
    # must differ ONLY in cores, and small files need small splits
    spark = get_spark("panako-bench", cpus=args.cpus,
                      shuffle_partitions=64,
                      extra_conf={"spark.sql.files.maxPartitionBytes":
                                  str(8 * 1024 * 1024)})
    timings: dict[str, float] = {}

    if not args.skip_tables:
        import __spark_entry__ as E

        qs = E.queries()
        for name in HEADLINE:
            t0 = time.monotonic()
            df = qs[name](spark, sf_dir)
            n = df.count()
            timings[name] = round(time.monotonic() - t0, 3)
            _ = n

    images_per_sec = None
    n_images = 0
    if not args.skip_pipeline:
        from panako_spark.config import PanakoConfig
        from panako_spark.io.checkpoint import CheckpointStore
        from panako_spark.pipeline import run_pipeline

        corpus = bench_corpus_path(args.n_base)
        images = spark.read.parquet(corpus)
        n_images = images.count()
        ckpt = tempfile.mkdtemp(prefix="panako_bench_ckpt_")
        store = CheckpointStore(ckpt)
        t0 = time.monotonic()
        if args.mode == "store":
            from panako_spark.stages.extract import (
                run_extract, split_prints, split_signatures,
            )
            cfg = PanakoConfig()
            extracted = store.read_or_compute(
                spark, "extracted", lambda: run_extract(images, cfg))
            store.write(split_prints(extracted), "prints")
            store.write(split_signatures(extracted), "signatures")
            key = "image_store"
        else:
            res = run_pipeline(spark, images, store, PanakoConfig())
            res.clusters.count()
            key = "image_dedup_pipeline"
        dt = time.monotonic() - t0
        timings[key] = round(dt, 3)
        images_per_sec = round(n_images / dt, 2)
        shutil.rmtree(ckpt, ignore_errors=True)

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "panako_spark total wall-clock (headline queries + "
                  "image dedup pipeline)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cpus": args.cpus,
        "n_images": n_images,
        "images_per_sec": images_per_sec,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
