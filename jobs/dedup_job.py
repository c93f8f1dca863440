"""spark-submit entry point for the image+caption dedup pipeline.

Ships per the north rule as:

    python tools/make_pyfiles.py          # -> dist/panako_spark.zip
    spark-submit --py-files dist/panako_spark.zip jobs/dedup_job.py \\
        --images  /path/to/images_parquet_or_iceberg \\
        --store   /path/to/checkpoint_root \\
        --output  /path/to/clusters_out \\
        [--synthetic 500]   # generate a seeded corpus instead of --images

On a cluster the SparkSession comes from spark-submit's conf (we call
getOrCreate with no master override); locally it falls back to
local[SPARK_GRAFT_CPUS]. The job is resumable: re-submitting with the
same --store resumes at the first incomplete stage.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", help="input parquet path (image_id, bytes, "
                                     "w, h, fmt, caption, phash)")
    ap.add_argument("--synthetic", type=int, default=0,
                    help="generate a deterministic corpus of N base images")
    ap.add_argument("--store", required=True, help="checkpoint root")
    ap.add_argument("--output", help="where to write clusters (default: "
                                     "inside --store)")
    ap.add_argument("--seed", type=int, default=1234)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.appName("panako-dedup")
             .config("spark.sql.ansi.enabled", "false")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.adaptive.skewJoin.enabled", "true")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .getOrCreate())

    from panako_spark.config import PanakoConfig
    from panako_spark.io.checkpoint import CheckpointStore
    from panako_spark.pipeline import run_pipeline

    if args.synthetic:
        if args.synthetic >= 2000:
            # cluster-parallel deterministic generation (content is
            # per-base-index seeded, independent of partitioning)
            import os

            from panako_spark.data.synth import write_corpus_spark

            path = os.path.join(args.store, "_synthetic_input")
            write_corpus_spark(spark, path, args.synthetic,
                               dup_fraction=0.3, seed=args.seed)
            images = spark.read.parquet(path)
        else:
            from panako_spark.data.synth import (
                generate_corpus, rows_to_pandas,
            )

            rows, _ = generate_corpus(args.synthetic, dup_fraction=0.3,
                                      seed=args.seed)
            images = spark.createDataFrame(rows_to_pandas(rows))
    elif args.images:
        images = spark.read.parquet(args.images)
    else:
        ap.error("one of --images / --synthetic is required")

    store = CheckpointStore(args.store)
    t0 = time.monotonic()
    res = run_pipeline(spark, images, store, PanakoConfig())
    n_clusters = res.clusters.count()
    if args.output:
        res.clusters.write.mode("overwrite").parquet(args.output)
    out = {"elapsed_s": round(time.monotonic() - t0, 1),
           "cluster_rows": n_clusters,
           "dup_pairs": res.dup_pairs.count(),
           "stats": {k: v for k, v in res.stats.items()
                     if not hasattr(v, "items")} | {
               k: dict(v) for k, v in res.stats.items()
               if hasattr(v, "items")}}
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
