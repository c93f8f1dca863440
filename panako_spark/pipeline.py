"""End-to-end dedup pipeline: the Spark re-expression of the reference's
store -> query -> dedup lifecycle (SURVEY.md §3):

    images (Iceberg/parquet)
      -> extract [mapInPandas, one decode pass, in-memory persist]
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
    split_tile_prints,
)
from panako_spark.stages.verify import run_tile_verify, run_verify


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


def materialize_extract(spark: SparkSession, images: DataFrame,
                        store: CheckpointStore, cfg: PanakoConfig,
                        stats: dict | None = None,
                        lineage_sink: list | None = None
                        ) -> tuple[DataFrame, DataFrame, DataFrame | None]:
    """One decode pass -> durable prints + signatures checkpoints.

    The extract output is NOT checkpointed: its rows carry ~600-element
    print arrays per image, and Spark's parquet writer takes the slow
    row-oriented path for nested columns — measured on the 87k-image
    bench corpus, writing that intermediate cost ~4x the extract compute
    itself and, being core-count-independent, capped store-mode scaling
    at ~0.25 efficiency. Instead the extract persists in memory/disk for
    exactly two consumers: prints (exploded to FLAT columns — the
    vectorized parquet path) and signatures (one nested row per image).
    Resume reads the two durable tables; the ephemeral intermediate is
    recomputed only if neither is complete.

    The third return value is the still-PERSISTED extract relation (None
    on the resume path): the crop-rescue tile branch reads its tile
    probe arrays from the same cache — one decode pass feeds everything.
    The caller unpersists it once the tile branch is done.
    """
    if store.is_complete("prints") and store.is_complete("signatures"):
        return (store.read(spark, "prints"),
                store.read(spark, "signatures"), None)
    stats = stats if stats is not None else {}
    extracted = run_extract(images, cfg).persist()
    ok = False
    try:
        t0 = time.monotonic()
        # prints carry no pre-partitioning: the landmark probe join
        # shuffles on the expanded probe_hash anyway. This first action
        # materializes extract into the cache as a side effect.
        fp = cfg.extraction_fingerprint()
        store.write(split_prints(extracted), "prints", config_fp=fp)
        stats["t_extract_prints_s"] = round(time.monotonic() - t0, 2)
        t0 = time.monotonic()
        store.write(split_signatures(extracted), "signatures", config_fp=fp)
        stats["t_signatures_s"] = round(time.monotonic() - t0, 2)
        t0 = time.monotonic()
        lin = lineage_from_extracted(extracted, "extract", store.run_id)
        if lineage_sink is not None:
            # defer: the caller batches every lineage frame into ONE
            # append job at the end of the run (the per-stage append
            # writes were pure driver-serial cost). The aggregate is
            # collected now, while the extract is still cached.
            lineage_sink.extend(lin.collect())
        else:
            store.append_lineage(lin)
        stats["t_lineage_s"] = round(time.monotonic() - t0, 2)
        ok = True
    finally:
        if not ok:
            extracted.unpersist()
    return (store.read(spark, "prints"), store.read(spark, "signatures"),
            extracted)


def corpus_census(images: DataFrame) -> tuple[int, int, int]:
    """(n_rows, n_distinct_ids, n_distinct_hashed_ids) in ONE action.

    Feeds the corpus-size-aware stop-word cap, the duplicate-image_id
    guard (a store is keyed by image_id; duplicate input rows would mint
    two iids for one id and silently diverge from the golden matcher),
    and — for legacy pre-iid stores only — the xxhash64 collision guard.
    The default path mints dictionary ids at ingest (extract.run_extract)
    so the hash guard is a cheap invariant, not a correctness crutch."""
    row = images.agg(
        F.count("*").alias("n"),
        F.countDistinct("image_id").alias("nd"),
        F.countDistinct(F.xxhash64("image_id")).alias("nh")).first()
    return int(row["n"]), int(row["nd"]), int(row["nh"])


def run_pipeline(spark: SparkSession, images: DataFrame, store: CheckpointStore,
                 cfg: PanakoConfig | None = None) -> PipelineResult:
    """Scaling-efficiency discipline (BASELINE.json: >=0.8 N->4N): the
    driver-serial term is minimized by (a) overlapping independent DAG
    branches — the corpus census rides alongside extract, and the
    landmark verify branch runs CONCURRENTLY with the fused signature
    channels from two submitter threads (Spark schedules both job DAGs;
    barrier gaps and Python-worker phases of one branch are filled with
    the other's tasks); (b) one consolidated lineage append at the end
    instead of per-stage append jobs; (c) no dup_pairs re-write — the
    union of the two checkpointed branch tables IS the pair set."""
    cfg = cfg or PanakoConfig()
    stats: dict = {}
    t_start = time.monotonic()
    from concurrent.futures import ThreadPoolExecutor

    lineage_rows: list = []
    extracted: DataFrame | None = None
    ex = ThreadPoolExecutor(max_workers=3)
    try:
        # census (tiny id-only aggregate) overlaps the extract scan
        def _census():
            try:
                spark.sparkContext.setJobDescription("panako:census")
            except Exception:  # noqa: BLE001
                pass
            return corpus_census(images)

        census_fut = ex.submit(_census)

        def timed(name: str, fn):
            t0 = time.monotonic()
            # thread-local job label: every Spark job this branch thread
            # submits shows as panako:<stage> in the UI/event log — the
            # three concurrent branches are otherwise indistinguishable
            # "parquet at ..." writes when profiling scaling
            try:
                spark.sparkContext.setJobDescription(f"panako:{name}")
            except Exception:  # noqa: BLE001 — labels must never fail a run
                pass
            out = fn()
            stats[f"t_{name}_s"] = round(time.monotonic() - t0, 2)
            return out

        def arrow_batch(rows: int) -> None:
            # runtime-settable; image rows are ~200 KB so extract wants
            # small batches, while flat-int stages want big ones
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch",
                           str(rows))

        # ---- extract (one decode pass) -------------------------------------
        arrow_batch(cfg.arrow_batch_rows)
        prints, signatures, extracted = timed(
            "extract", lambda: materialize_extract(
                spark, images, store, cfg, stats,
                lineage_sink=lineage_rows))

        n_images, n_ids, n_hashed = census_fut.result()
        if n_images != n_ids:
            raise ValueError(
                f"input has {n_images} rows but only {n_ids} distinct "
                "image_ids. A store is keyed by image_id; duplicate rows "
                "would mint multiple iids for one id and silently diverge "
                "from reference semantics — dedupe the input "
                "(dropDuplicates('image_id')) and rerun.")
        if "iid" not in prints.columns and n_ids != n_hashed:
            # legacy pre-iid checkpoint: the verify shuffle would run on
            # xxhash64(image_id), where a collision silently merges two
            # images' hit lists
            raise RuntimeError(
                f"xxhash64(image_id) collision: {n_ids} distinct ids -> "
                f"{n_hashed} distinct hashes, and this store predates "
                "minted iids. Clear the store and re-extract (ids are "
                "minted collision-free at ingest now).")
        stats["n_images"] = n_images
        stats["n_distinct_ids"] = n_ids

        # ---- landmark verify ∥ fused signature channels ---------------------
        arrow_batch(8192)

        # one distinct store-hash relation feeds BOTH probe branches'
        # semi pre-filter (candidates._semi_prefilter) — persisted so
        # the concurrent branches don't race to recompute the distinct
        store_hashes = None
        if cfg.probe_prefilter == "semi":
            store_hashes = C.store_hash_relation(prints).persist()

        # (iid, rescued, phash) is a tiny per-image relation; broadcast
        # onto verify outputs so rescued pairs face the stricter
        # composite gate (config.rescue_min_score block — the
        # print-rescue precision guard): strong alignment alone, or
        # decent alignment corroborated by the independent phash
        # signal. Stores written before the rescue flag existed have no
        # column: nothing was rescued there, so the gate is a no-op.
        if "rescued" in signatures.columns:
            resc = signatures.select(
                (F.col("iid") if "iid" in signatures.columns
                 else F.xxhash64("image_id")).alias("_rid"),
                F.col("rescued").alias("_resc"),
                F.col("phash").alias("_ph"))

            def rescue_gate(df: DataFrame, col_a: str, col_b: str,
                            extra_resc: str | None = None) -> DataFrame:
                # extra_resc: a boolean column already on df marking a
                # dense-picked probe (the per-TILE rescue flag) — a
                # rescued probe aligns spuriously exactly like a
                # rescued image, so it faces the same composite gate
                a = resc.select(F.col("_rid").alias(col_a),
                                F.col("_resc").alias("_ra"),
                                F.col("_ph").alias("_pa"))
                b = resc.select(F.col("_rid").alias(col_b),
                                F.col("_resc").alias("_rb"),
                                F.col("_ph").alias("_pb"))
                ham = F.bit_count(
                    F.col("_pa").bitwiseXOR(F.col("_pb")))
                pair_rescued = (F.coalesce("_ra", F.lit(False))
                                | F.coalesce("_rb", F.lit(False)))
                if extra_resc is not None:
                    pair_rescued = pair_rescued | F.coalesce(
                        extra_resc, F.lit(False))
                keep = (
                    ~pair_rescued
                    | (F.col("score") >= cfg.rescue_strong_score)
                    | ((F.col("score") >= cfg.rescue_min_score)
                       & (ham <= cfg.rescue_phash_max)))
                # no broadcast hint: the flag relation is per-image
                # (10^12 rows at target scale), while the verified
                # relation it joins is post-gate and usually far
                # smaller — AQE picks broadcast at runtime when a side
                # is actually small, and an equi-join on the int64 id
                # is the safe default either way
                return (df.join(a, col_a, "left")
                        .join(b, col_b, "left")
                        .where(keep)
                        .drop("_ra", "_rb", "_pa", "_pb"))
        else:
            def rescue_gate(df: DataFrame, col_a: str, col_b: str,
                            extra_resc: str | None = None) -> DataFrame:
                return df

        def compute_verified() -> DataFrame:
            # Q5's min-hits gate runs inside the verify kernel (one
            # shuffle on the pair key); the widest shuffle of the
            # pipeline runs on int64 ids, resolved back to strings after
            # the stop-word cap is a function of DISTINCT stored images
            # (the golden matcher counts len(self._prints)); feeding the
            # raw row count would diverge on duplicate image_id inputs
            v = run_verify(C.landmark_hits(prints, cfg, numeric_ids=True,
                                           n_images=n_ids,
                                           store_hashes=store_hashes),
                           cfg, numeric_ids=True)
            v = rescue_gate(v, "id_a", "id_b")
            # the signatures table carries the persisted iid<->string map
            return C.resolve_numeric_ids(v, signatures)

        fused_stats_box: list = []
        fused_caches: list = []

        def compute_fused() -> DataFrame:
            fused, fused_stats = C.fused_candidate_pairs(
                signatures, images, cfg, caches=fused_caches)
            fused_stats_box.append(fused_stats)
            return fused.select("channel", "id_a", "id_b")

        def compute_tile_pairs() -> DataFrame:
            # crop-rescue channel: tile probe prints (query-time
            # ephemera from the SAME decode pass, riding the extract
            # cache) ±range the stored prints; verify per (pair, tile,
            # direction); accept at score >= tile_min_score. Golden
            # sibling: GoldenMatcher.tile_rescue_pairs.
            if not cfg.tile_rescue:
                return spark.createDataFrame([], "id_a string, id_b string")
            if extracted is not None:
                tp = split_tile_prints(extracted)
            else:
                # resumed run whose tile_pairs checkpoint is missing:
                # one re-decode pass (the documented resume trade — tile
                # prints are never persisted). Freshly minted iids are
                # NOT the store's ids; remap through the persisted
                # signatures id map.
                ext2 = run_extract(images, cfg)
                sig_ids = signatures.select(
                    "image_id",
                    (F.col("iid") if "iid" in signatures.columns
                     else F.xxhash64("image_id")).alias("iid"))
                tp = (split_tile_prints(ext2).drop("iid")
                      .join(sig_ids, "image_id"))
            qid_col = "iid" if "iid" in tp.columns else "image_id"
            tile_flags = (tp.groupBy(F.col(qid_col).alias("id_q"),
                                     "tile_id")
                          .agg(F.max("tile_resc").alias("_tresc")))
            tv = run_tile_verify(C.tile_hits(tp, prints, cfg,
                                             n_images=n_ids,
                                             store_hashes=store_hashes), cfg)
            tv = tv.join(tile_flags, ["id_q", "tile_id"], "left")
            tv = rescue_gate(tv, "id_q", "id_r", extra_resc="_tresc") \
                .drop("_tresc")
            directed = (tv.where(F.col("score") >= cfg.tile_min_score)
                        .select(F.least("id_q", "id_r").alias("id_a"),
                                F.greatest("id_q", "id_r").alias("id_b"))
                        .distinct())
            return C.resolve_numeric_ids(directed, signatures)

        fut_v = ex.submit(lambda: timed("verify", lambda: (
            store.read_or_compute(spark, "verified", compute_verified))))
        fut_f = ex.submit(lambda: timed("pairs", lambda: (
            store.read_or_compute(spark, "fused_pairs", compute_fused))))
        fut_t = ex.submit(lambda: timed("tiles", lambda: (
            store.read_or_compute(spark, "tile_pairs", compute_tile_pairs))))
        verified = fut_v.result()
        fused_pairs = fut_f.result()
        tile_pairs = fut_t.result()
        if store_hashes is not None:
            store_hashes.unpersist()
        if extracted is not None:
            extracted.unpersist()
            extracted = None

        dup_pairs = (verified
                     .select(F.lit("landmark").alias("channel"),
                             "id_a", "id_b")
                     .unionByName(fused_pairs)
                     .unionByName(tile_pairs.select(
                         F.lit("tile").alias("channel"), "id_a", "id_b"))
                     .select("id_a", "id_b", "channel"))

        if fused_stats_box:
            # the band-count cache is warm after the fused write, so this
            # stats job costs ~nothing; rows go into the one deferred
            # lineage append below
            rows = fused_stats_box[0].collect()
            for row in rows:
                stats[f"bands_{row['channel']}"] = {k: row[k] for k in (
                    "n_keys", "n_hot_keys", "dropped_cross_pairs_estimate")}
            lineage_rows.extend(
                (f"bands_{r['channel']}", -1, int(r["n_keys"]),
                 int(r["n_hot_keys"]),
                 int(r["dropped_cross_pairs_estimate"]), 0, store.run_id)
                for r in rows)
        for c in fused_caches:   # release candidate/count caches: repeated
            c.unpersist()        # runs in one session must not leak memory

        # ---- clustering -----------------------------------------------------
        clusters = timed("cluster", lambda: store.read_or_compute(
            spark, "clusters",
            lambda: connected_components(
                dup_pairs.select("id_a", "id_b").distinct(),
                images.select("image_id"),
                cfg.cc_max_iterations)))

        # ---- one consolidated lineage append --------------------------------
        if lineage_rows:
            # a handful of driver-local rows: one slice, not
            # defaultParallelism Python-worker tasks (measured ~3 s of
            # pure worker-spawn wait at local[8] for an 8-slice
            # ParallelCollection of ~20 rows)
            store.append_lineage(spark.createDataFrame(
                [tuple(r) for r in lineage_rows],
                schema="stage string, partition_id int, input_count long, "
                       "signature_count long, band_count long, "
                       "elapsed_ms long, run_id string").coalesce(1))
    finally:
        if extracted is not None:
            extracted.unpersist()
        ex.shutdown(wait=False)

    stats["elapsed_s"] = time.monotonic() - t_start
    return PipelineResult(clusters=clusters, dup_pairs=dup_pairs,
                          verified=verified, stats=stats)
