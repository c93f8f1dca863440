"""One-off measurement: how much of each probe join's probe side ever
matches a store hash? Feeds the semi-join pre-filter decision
(candidates.landmark_hits / tile_hits): the probe exchange is the
pipeline's widest shuffle, and rows whose key matches nothing are pure
exchange+join overhead a broadcast semi filter can drop map-side.

Usage: taskset -c 8-31 python tools/probe_rate_measure.py [n_base]
"""
from __future__ import annotations

import sys
import tempfile
import time

import pyspark.sql.functions as F

sys.path.insert(0, "/root/repo")

from panako_spark.config import PanakoConfig
from panako_spark.io.checkpoint import CheckpointStore
from panako_spark.pipeline import materialize_extract
from panako_spark.session import get_spark
from panako_spark.stages import candidates as C
from panako_spark.stages.extract import split_tile_prints

n_base = int(sys.argv[1]) if len(sys.argv) > 1 else 8000
spark = get_spark("probe-rate", cpus=16, shuffle_partitions=256)
import bench

corpus = bench.bench_corpus_path(n_base, spark=spark)
images = spark.read.parquet(corpus)
cfg = PanakoConfig()
store = CheckpointStore(tempfile.mkdtemp(prefix="probe_rate_"))
t0 = time.time()
stats: dict = {}
prints, signatures, extracted = materialize_extract(
    spark, images, store, cfg, stats)
n_images = images.count()
print(f"extract done {time.time()-t0:.1f}s n_images={n_images}", flush=True)

n_ids = n_images  # synth corpus has unique ids

# ---- landmark channel ----
p = C.hot_hash_filter(prints, cfg, n_images=n_ids)
n_prints = p.count()
n_distinct_h = p.select("hash").distinct().count()
r = cfg.query_range
probe_rows = n_prints * (2 * r + 1)
hs = p.select("hash").distinct()
exploded = p.select(
    F.explode(F.sequence(F.col("hash") - r, F.col("hash") + r))
    .alias("probe_hash"))
survivors = exploded.join(
    F.broadcast(hs.withColumnRenamed("hash", "probe_hash")),
    "probe_hash", "left_semi").count()
hits = C.landmark_hits(prints, cfg, numeric_ids=True, n_images=n_ids)
n_hits = hits.count()
print(f"landmark: prints={n_prints} distinct_h={n_distinct_h} "
      f"probe_rows={probe_rows} semi_survivors={survivors} "
      f"({100*survivors/probe_rows:.1f}%) hits={n_hits}", flush=True)

# ---- tile channel ----
tp = split_tile_prints(extracted)
hot = C.hot_hash_set(prints, cfg, n_images=n_ids, cap=cfg.hash_max_images)
store_p = prints.join(hot, "hash", "left_anti")
q = tp.join(hot, "hash", "left_anti")
n_tp = q.count()
shs = store_p.select("hash").distinct()
n_store_h = shs.count()
tsurv = q.join(F.broadcast(shs), "hash", "left_semi").count()
thits = C.tile_hits(tp, prints, cfg, n_images=n_ids)
n_thits = thits.count()
print(f"tiles: tile_probe_rows={n_tp} store_distinct_h={n_store_h} "
      f"semi_survivors={tsurv} ({100*tsurv/n_tp:.1f}%) hits={n_thits}",
      flush=True)
if extracted is not None:
    extracted.unpersist()
spark.stop()
