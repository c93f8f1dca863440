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

    extracted = timed("extract", lambda: store.read_or_compute(
        spark, "extracted", compute_extracted))
    store.append_lineage(lineage_from_extracted(extracted, "extract",
                                                store.run_id))

    prints = timed("prints", lambda: store.read_or_compute(
        spark, "prints",
        lambda: split_prints(extracted).repartition(
            cfg.shuffle_partitions, "hash")))
    signatures = timed("signatures", lambda: store.read_or_compute(
        spark, "signatures", lambda: split_signatures(extracted)))

    # ---- candidate channels --------------------------------------------------
    def compute_verified() -> DataFrame:
        # Q5's min-hits gate lives inside run_verify's aggregation (one
        # shuffle; map-side partial agg shrinks it)
        return run_verify(C.landmark_hits(prints, cfg), cfg)

    verified = timed("verify", lambda: store.read_or_compute(
        spark, "verified", compute_verified))

    def compute_pairs() -> DataFrame:
        mh, mh_stats = C.minhash_pairs(signatures, cfg)
        sh, sh_stats = C.simhash_pairs(signatures, cfg)
        ph, ph_stats = C.phash_pairs(signatures, cfg)
        ce, ce_stats = C.caption_exact_pairs(signatures, cfg)
        cs, cs_stats = C.caption_substring_pairs(signatures, images, cfg)
        # single action for all channels' band stats
        stats_df = None
        for stage, s in (("bands_minhash", mh_stats),
                         ("bands_simhash", sh_stats),
                         ("bands_phash", ph_stats),
                         ("bands_caption_exact", ce_stats),
                         ("bands_substring", cs_stats)):
            s = s.select(F.lit(stage).alias("stage"), "n_keys", "n_hot_keys",
                         "dropped_cross_pairs_estimate")
            stats_df = s if stats_df is None else stats_df.union(s)
        for row in stats_df.collect():
            stats[row["stage"]] = {k: row[k] for k in (
                "n_keys", "n_hot_keys", "dropped_cross_pairs_estimate")}
            store.append_lineage(
                _band_stats_lineage(spark, row["stage"], row, store.run_id))
        lm = verified.select("id_a", "id_b",
                             F.lit("landmark").alias("channel"))
        return (lm
                .union(mh.select("id_a", "id_b",
                                 F.lit("minhash").alias("channel")))
                .union(sh.select("id_a", "id_b",
                                 F.lit("simhash").alias("channel")))
                .union(ph.select("id_a", "id_b",
                                 F.lit("phash").alias("channel")))
                .union(ce.select("id_a", "id_b",
                                 F.lit("caption_exact").alias("channel")))
                .union(cs.select("id_a", "id_b",
                                 F.lit("caption_substring").alias("channel"))))

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
