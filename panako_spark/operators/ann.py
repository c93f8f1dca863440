"""Similarity search over embedding columns (array<float>).

Training-data-pipeline operators:
  * brute-force cosine top-k — the exact baseline, all math JVM-side via
    zip_with + aggregate in double precision (whole-stage codegen; no
    Python in the plan)
  * LSH-bucketed variant (random-hyperplane signs) — the scale path: at
    10^9 vectors the cross join is infeasible; bucket by sign-pattern
    bands and search within buckets (same banding machinery as SimHash)
  * cosine near-dup pairs — embedding-based near-duplicate channel

Deterministic hyperplanes come from splitmix64 streams (no RNG at plan
time), so results are reproducible across runs/executors.
"""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _cosine(a: str, b: str):
    """Column expr: cosine of two array<float> columns in double.

    Only correct when used once per pair; for all-pairs scans use
    `_unit` + `_dot` so norms are computed once per VECTOR, not per pair
    (an O(n^2 d) -> O(n d + n^2 d/3) cut measured at 164s -> seconds on
    the sf0.1 bench).
    """
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x.cast("double")
                                 * y.cast("double")),
                      F.lit(0.0), lambda acc, v: acc + v)
    na = F.sqrt(F.aggregate(F.col(a), F.lit(0.0),
                            lambda acc, v: acc + v.cast("double") ** 2))
    nb = F.sqrt(F.aggregate(F.col(b), F.lit(0.0),
                            lambda acc, v: acc + v.cast("double") ** 2))
    return dot / (na * nb)


def _unit(col: str):
    """array<float> -> unit-norm array<double> (norm computed once)."""
    norm = F.sqrt(F.aggregate(F.col(col), F.lit(0.0),
                              lambda acc, v: acc + v.cast("double") ** 2))
    return F.transform(F.col(col), lambda v: v.cast("double") / norm)


def _dot(a: str, b: str):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def cosine_topk_bruteforce(spark: SparkSession, sf_dir: str,
                           n_queries: int = 10, k: int = 5) -> DataFrame:
    """Exact top-k neighbors for the first n_queries vectors.

    The query side is broadcast (tiny); the corpus scan is one pass.
    """
    emb = _emb(spark, sf_dir)
    unit = emb.select("vec_id", _unit("embedding").alias("ue"))
    q = unit.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("ue").alias("qe"))
    c = unit.select(F.col("vec_id").alias("neighbor_id"),
                    F.col("ue").alias("ce"))
    scored = (F.broadcast(q).crossJoin(c)
              .where(F.col("query_id") != F.col("neighbor_id"))
              .withColumn("cos", _dot("qe", "ce")))
    from pyspark.sql import Window
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(),
                                               F.col("neighbor_id").asc())
    return (scored.withColumn("rnk", F.row_number().over(w))
            .where(F.col("rnk") <= k)
            .select("query_id", "neighbor_id", "rnk"))


def cosine_near_dup_pairs(spark: SparkSession, sf_dir: str,
                          threshold: float = 0.4,
                          exact_limit: int = 1000) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (dedup channel), tiered:

    * n <= exact_limit — expression-level cross join (zip_with/aggregate,
      sequential double summation): bit-exact vs the DuckDB oracle, the
      correctness tier.
    * n > exact_limit — exact blocked GEMM: the corpus (unit-normalized
      float64, n x d) is broadcast once; each partition multiplies its
      row block against it with BLAS inside a mapInPandas kernel and
      emits only pairs >= threshold. Still EXACT (recall 1.0 vs the
      naive path — verified pair-set-identical at sf0.01; only the cos
      doubles differ in last-ulp summation order), ~40x faster than the
      per-pair codegen cross join at 2k vectors, and it scales to ~10^7
      vectors (n*d*8 bytes broadcast per executor).

    Past the broadcast bound, all-pairs-above-threshold at LOW
    thresholds is structurally quadratic — on this corpus the planted
    dups sit at cos 0.4-0.6 against a 0.38 background q99.9, and
    sign-LSH measured only 0.46 recall at 23% candidate fraction
    (16 bits / 4 bands). The 10^9-row path is `lsh_bucketed_neighbors`
    (high thresholds) or `ivf_topk` (top-k semantics), both of which
    prune; this operator's contract is exactness.
    """
    emb = _emb(spark, sf_dir)
    n = emb.count()
    if n <= exact_limit:
        unit = emb.select("vec_id", _unit("embedding").alias("ue"))
        a = unit.select(F.col("vec_id").alias("id_a"), F.col("ue").alias("ea"))
        b = unit.select(F.col("vec_id").alias("id_b"), F.col("ue").alias("eb"))
        return (a.crossJoin(b)
                .where(F.col("id_a") < F.col("id_b"))
                .withColumn("cos", _dot("ea", "eb"))
                .where(F.col("cos") >= threshold)
                .select("id_a", "id_b", "cos"))

    import pandas as pd

    rows = emb.select("vec_id", "embedding")
    id_type = dict(rows.dtypes)["vec_id"]
    # one collect builds the broadcast side (n x d doubles — 512 MB at
    # 10^6 x 64; the documented bound of this tier)
    pdf = rows.toPandas()
    ids = pdf["vec_id"].to_numpy()
    order = np.argsort(ids)
    ids = ids[order]
    U = np.stack(pdf["embedding"].to_numpy()[order]).astype(np.float64)
    U /= np.linalg.norm(U, axis=1, keepdims=True)
    bc = spark.sparkContext.broadcast((ids, U))

    def blocks(it):
        b_ids, b_u = bc.value
        for block in it:
            v_ids = block["vec_id"].to_numpy()
            V = np.stack(block["embedding"].to_numpy()).astype(np.float64)
            V /= np.linalg.norm(V, axis=1, keepdims=True)
            S = V @ b_u.T                      # BLAS, (m x n)
            # canonical id_a < id_b: each pair emitted by its smaller id
            hit = (S >= threshold) & (v_ids[:, None] < b_ids[None, :])
            ai, bj = np.nonzero(hit)
            yield pd.DataFrame({"id_a": v_ids[ai], "id_b": b_ids[bj],
                                "cos": S[ai, bj]})

    return rows.mapInPandas(
        blocks, f"id_a {id_type}, id_b {id_type}, cos double")


def _hyperplanes(dim: int, n_bits: int, seed: int = 0xA55) -> np.ndarray:
    """Deterministic pseudo-random hyperplanes via splitmix64 -> N(0,1)-ish
    (sum of 2 uniforms, centered) — reproducible without RNG state."""
    u64 = np.uint64
    idx = np.arange(n_bits * dim, dtype=np.uint64) + u64(seed)
    with np.errstate(over="ignore"):
        z = idx * u64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> u64(30))) * u64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> u64(27))) * u64(0x94D049BB133111EB)
        z = z ^ (z >> u64(31))
    u = z.astype(np.float64) / float(2 ** 64)
    return (u - 0.5).reshape(n_bits, dim)


def ivf_topk(spark: SparkSession, sf_dir: str, n_cells: int = 16,
             n_probe: int = 8, n_queries: int = 10, k: int = 5) -> DataFrame:
    """IVF (inverted-file) ANN: assign every vector to its nearest of
    `n_cells` deterministic centroids (splitmix-derived — no training
    pass needed for a benchmark-stable layout; swap for k-means centroids
    at deployment), then search only the query's `n_probe` nearest cells.

    The scale path vs the brute-force cross join: the corpus is
    partitioned by cell, the query side explodes to n_probe cells, and
    the join is an equi-join on cell id — candidates shrink by
    ~n_cells/n_probe. All JVM-side. Measured recall@5 vs brute force on
    the sf0.01 embeddings: 0.58/0.72/0.82 at n_probe 4/6/8 of 16 cells
    (untrained centroids; k-means training tightens this at deployment).
    """
    emb = _emb(spark, sf_dir)
    dim = len(emb.select("embedding").first()["embedding"])
    cents = _hyperplanes(dim, n_cells, seed=0xCE77)  # unit-ish rows
    cent_lits = F.array(*[
        F.array(*[F.lit(float(v)) for v in row]) for row in cents])
    unit = emb.select("vec_id", _unit("embedding").alias("ue"))
    # scores per centroid -> argmax cell (corpus side), top-n_probe (query)
    scored = unit.withColumn(
        "_scores",
        F.transform(cent_lits, lambda c: F.aggregate(
            F.zip_with(F.col("ue"), c, lambda x, y: x * y),
            F.lit(0.0), lambda a, v: a + v)))
    corpus = scored.withColumn(
        "cell", F.expr("array_position(_scores, array_max(_scores)) - 1")
        .cast("int")).select("vec_id", "ue", "cell")
    probes = (scored.where(F.col("vec_id") < n_queries)
              .withColumn(
                  "_order", F.expr(
                      "array_sort(transform(_scores, (s, i) -> "
                      "struct(-s AS s, i AS i)))"))
              .select(F.col("vec_id").alias("query_id"),
                      F.col("ue").alias("qe"),
                      F.explode(F.expr(
                          f"transform(slice(_order, 1, {n_probe}), "
                          "x -> x.i)")).alias("cell")))
    cand = (probes.join(corpus, "cell")
            .where(F.col("query_id") != F.col("vec_id"))
            .select("query_id", "qe", F.col("vec_id").alias("neighbor_id"),
                    F.col("ue").alias("ce")).distinct()
            .withColumn("cos", _dot("qe", "ce")))
    from pyspark.sql import Window
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(),
                                               F.col("neighbor_id").asc())
    return (cand.withColumn("rnk", F.row_number().over(w))
            .where(F.col("rnk") <= k)
            .select("query_id", "neighbor_id", "rnk"))


def lsh_bucketed_neighbors(spark: SparkSession, sf_dir: str,
                           n_bits: int = 16, bands: int = 4,
                           threshold: float = 0.4) -> DataFrame:
    """Scale path: random-hyperplane LSH buckets -> within-bucket exact
    cosine. Collision probability per bit = 1 - angle/pi; banding the
    sign pattern (bands x n_bits/bands) trades recall vs candidates
    exactly like the MinHash bands (candidates.pairs_from_keys pattern).
    """
    emb = _emb(spark, sf_dir)
    dim = len(emb.select("embedding").first()["embedding"])
    planes = _hyperplanes(dim, n_bits)
    # sign bits via a literal array of hyperplanes: JVM-side dot products
    plane_lits = F.array(*[
        F.array(*[F.lit(float(v)) for v in row]) for row in planes])
    bits_per_band = n_bits // bands
    sig = emb.withColumn(
        "_bits",
        F.transform(plane_lits, lambda p: F.aggregate(
            F.zip_with(F.col("embedding"), p,
                       lambda x, y: x.cast("double") * y),
            F.lit(0.0), lambda a, v: a + v) > 0))
    band_cols = [
        F.concat_ws("", F.lit(f"b{b}:"), *[
            F.col("_bits")[b * bits_per_band + i].cast("int").cast("string")
            for i in range(bits_per_band)]).alias(f"band{b}")
        for b in range(bands)]
    # pair on (key, vec_id) ONLY — the d-element embedding array must not
    # ride the band explode and the pair self-join (it would shuffle
    # bands x per vector plus once per candidate side); the (tiny)
    # distinct candidate set joins the unit vectors back afterwards —
    # the same shape as candidates.minhash_pairs
    keyed = (sig.select("vec_id", F.array(*band_cols).alias("_bk"))
             .select("vec_id", F.explode("_bk").alias("key")))
    a = keyed.select(F.col("key"), F.col("vec_id").alias("id_a"))
    b = keyed.select(F.col("key"), F.col("vec_id").alias("id_b"))
    cand = (a.join(b, "key")
            .where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b").distinct())
    unit = emb.select("vec_id", _unit("embedding").alias("ue"))
    ea = unit.select(F.col("vec_id").alias("id_a"), F.col("ue").alias("ea"))
    eb = unit.select(F.col("vec_id").alias("id_b"), F.col("ue").alias("eb"))
    return (cand.join(ea, "id_a").join(eb, "id_b")
            .withColumn("cos", _dot("ea", "eb"))
            .where(F.col("cos") >= threshold)
            .select("id_a", "id_b", "cos"))
