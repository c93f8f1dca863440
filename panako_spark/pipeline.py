"""End-to-end dedup pipeline: the Spark re-expression of the reference's
store -> query -> dedup lifecycle (SURVEY.md §3):

    images (Iceberg/parquet)
      -> extract [mapInPandas, one decode pass]      checkpoint: extracted
      -> prints / signatures                          checkpoints
      -> candidates: landmark ±range self-join, MinHash/SimHash LSH bands,
         exact caption, substring fingerprints        checkpoint: pairs
      -> verify [applyInPandas Q5-Q13 kernel]         checkpoint: verified
      -> connected components (large-star/small-star) checkpoint: clusters

Every stage goes through CheckpointStore.read_or_compute, so a killed run
resumes at the first incomplete stage (reference analog: the fingerprint
file cache, PanakoStrategy.java:181-207). Per-partition lineage rows and
per-channel band stats append to the lineage table on every (re)run.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from panako_spark.config import PanakoConfig
from panako_spark.io.checkpoint import CheckpointStore
from panako_spark.stages import candidates as C
from panako_spark.stages.cluster import connected_components
from panako_spark.stages.extract import (
    lineage_from_extracted, run_extract, split_prints, split_signatures,
)
from panako_spark.stages.verify import run_verify


@dataclass
class PipelineResult:
    clusters: DataFrame
    dup_pairs: DataFrame
    verified: DataFrame
    stats: dict


def _band_stats_lineage(spark: SparkSession, stage: str, stats_row,
                        run_id: str) -> DataFrame:
    return spark.createDataFrame(
        [(stage, -1, int(stats_row["n_keys"]), int(stats_row["n_hot_keys"]),
          int(stats_row["dropped_cross_pairs_estimate"]), 0, run_id)],
        schema="stage string, partition_id int, input_count long, "
               "signature_count long, band_count long, elapsed_ms long, "
               "run_id string")


def run_pipeline(spark: SparkSession, images: DataFrame, store: CheckpointStore,
                 cfg: PanakoConfig | None = None) -> PipelineResult:
    cfg = cfg or PanakoConfig()
    stats: dict = {}
    t_start = time.monotonic()

    def timed(name: str, fn):
        t0 = time.monotonic()
        out = fn()
        stats[f"t_{name}_s"] = round(time.monotonic() - t0, 2)
        return out

    # ---- extract (one decode pass) -----------------------------------------
    def compute_extracted() -> DataFrame:
        return run_extract(images, cfg)

    def arrow_batch(rows: int) -> None:
        # runtime-settable; image rows are ~200 KB so extract wants small
        # batches, while flat-int stages want big ones
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch",
                       str(rows))

    arrow_batch(cfg.arrow_batch_rows)
    extracted = timed("extract", lambda: store.read_or_compute(
        spark, "extracted", compute_extracted))
    store.append_lineage(lineage_from_extracted(extracted, "extract",
                                                store.run_id))

    # prints carry no partitioning: the landmark probe join shuffles on the
    # expanded probe_hash anyway, so a pre-shuffle on hash is wasted work
    prints = timed("prints", lambda: store.read_or_compute(
        spark, "prints", lambda: split_prints(extracted)))
    signatures = timed("signatures", lambda: store.read_or_compute(
        spark, "signatures", lambda: split_signatures(extracted)))

    # ---- landmark channel: probe join + alignment verify --------------------
    arrow_batch(8192)

    def compute_verified() -> DataFrame:
        # Q5's min-hits gate runs inside the verify kernel (one shuffle
        # on the pair key, no gate aggregation); the widest shuffle of
        # the pipeline runs on int64 ids, resolved back to strings after
        v = run_verify(C.landmark_hits(prints, cfg, numeric_ids=True),
                       cfg, numeric_ids=True)
        return C.resolve_numeric_ids(v, images)

    verified = timed("verify", lambda: store.read_or_compute(
        spark, "verified", compute_verified))

    # ---- signature channels, fused ------------------------------------------
    def compute_pairs() -> DataFrame:
        fused, fused_stats = C.fused_candidate_pairs(signatures, images, cfg)
        rows = fused_stats.collect()
        for row in rows:
            stats[f"bands_{row['channel']}"] = {k: row[k] for k in (
                "n_keys", "n_hot_keys", "dropped_cross_pairs_estimate")}
        store.append_lineage(spark.createDataFrame(
            [(f"bands_{r['channel']}", -1, int(r["n_keys"]),
              int(r["n_hot_keys"]),
              int(r["dropped_cross_pairs_estimate"]), 0, store.run_id)
             for r in rows],
            schema="stage string, partition_id int, input_count long, "
                   "signature_count long, band_count long, elapsed_ms long, "
                   "run_id string"))
        lm = verified.select(F.lit("landmark").alias("channel"),
                             "id_a", "id_b")
        return lm.unionByName(fused).select("id_a", "id_b", "channel")

    dup_pairs = timed("pairs", lambda: store.read_or_compute(
        spark, "dup_pairs", compute_pairs))

    # ---- clustering ------------------------------------------------------------
    clusters = timed("cluster", lambda: store.read_or_compute(
        spark, "clusters",
        lambda: connected_components(
            dup_pairs.select("id_a", "id_b").distinct(),
            images.select("image_id"),
            cfg.cc_max_iterations)))

    stats["elapsed_s"] = time.monotonic() - t_start
    return PipelineResult(clusters=clusters, dup_pairs=dup_pairs,
                          verified=verified, stats=stats)
