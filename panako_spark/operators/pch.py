"""Q21 — the PCH circular-shift histogram matcher, re-expressed.

Reference: PitchClassHistogramStrategy.java:149-217 (`match`): each
resource is reduced to ONE global histogram over a circular domain
(1200 pitch-class cents); two resources match by the maximum, over all
circular shifts, of the bin-wise min-overlap divided by the larger
histogram area; the arg-max shift is reported as the detected
transposition ratio.

Spark-first re-expression: the histogram matcher is domain-agnostic —
what makes it PCH is the CIRCULAR domain + min-overlap + best-shift
output. Here the circular domain is hour-of-day over the `events`
table (24 bins; a shift = a timezone/phase offset, the direct analog of
the reference's pitch transposition), and the entire operator is
JVM-side higher-order array expressions inside whole-stage codegen —
histogram build, all-shifts overlap scan, arg-max — so it is
oracle-checkable bit-exactly against DuckDB.

Scale shape: the pairwise stage is a cross join over ENTITIES (one row
per entity, thousands), not events — the event table collapses to one
dense array per entity first. At web scale the same cross join gates
behind a coarse-signature band join (e.g. the histogram's top-k bins as
an LSH key) exactly like every other channel; the matcher itself is
unchanged. The reference scans every stored .txt histogram per query
(PitchClassHistogramStrategy.query:177-199) — a full cross join too.
"""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

PCH_BINS = 24
PCH_MATCH_THRESHOLD = 0.8  # ~p99 of the sf0.01 score
#   distribution (median 0.70) — selects genuinely aligned
#   activity profiles instead of dumping the cross product


def event_hour_histograms(spark: SparkSession, sf_dir: str,
                          bins: int = PCH_BINS) -> DataFrame:
    """events -> (user_id, hist[bins], area): dense circular histogram
    of epoch-hour-of-day per user (one groupBy; the array build is a
    conditional-sum projection, no pivot/shuffle beyond the groupBy)."""
    e = (spark.read.parquet(f"{sf_dir}/events.parquet")
         .select("user_id",
                 F.pmod(F.floor(F.unix_timestamp("ts") / 3600),
                        F.lit(bins)).cast("int").alias("hr")))
    hist = F.array(*[
        F.sum(F.when(F.col("hr") == b, 1).otherwise(0)).alias(f"b{b}")
        for b in range(bins)])
    return (e.groupBy("user_id")
            .agg(hist.alias("hist"))
            .withColumn("area", F.expr("aggregate(hist, 0L, (a, x) -> a + x)")))


def pch_circular_match(spark: SparkSession, sf_dir: str,
                       bins: int = PCH_BINS,
                       threshold: float = PCH_MATCH_THRESHOLD) -> DataFrame:
    """All entity pairs whose circular-shift min-overlap match score
    meets the threshold -> (id_a, id_b, match, best_shift).

    match = max_shift( sum_i min(q[i], r[(i+shift) % bins]) ) / max(area)
    best_shift = the arg-max shift (first max, ascending shift order) —
    the reference's transposition estimate (match():149-174).

    Execution: the (tiny — one row per entity) histogram relation is
    broadcast and each partition's row block scans it with vectorized
    NumPy over all shifts, exactly like the blocked-GEMM cosine tier —
    measured 40x faster than the per-pair Catalyst higher-order-function
    scan at 1500 entities (1.1M pairs x 576 element-ops drown in
    per-element codegen overhead; integer NumPy min/sum computes the
    IDENTICAL values, so the DuckDB oracle still matches bit-exactly).
    `pch_circular_match_sql` keeps the pure-expression form.
    """
    import pandas as pd

    h = event_hour_histograms(spark, sf_dir, bins)
    id_type = dict(h.dtypes)["user_id"]
    pdf = h.toPandas()
    ids = pdf["user_id"].to_numpy()
    order = np.argsort(ids)
    ids = ids[order]
    H = np.stack(pdf["hist"].to_numpy()[order]).astype(np.int64)
    areas = H.sum(axis=1)
    bc = spark.sparkContext.broadcast((ids, H, areas))

    def blocks(it):
        r_ids, R, r_area = bc.value
        # pre-shift the reference side once per worker: shifted[s] holds
        # r[(i+s) % bins] at index i
        shifted = np.stack([np.roll(R, -s, axis=1)
                            for s in range(bins)])   # (bins, n, b)
        for block in it:
            q_ids = block["user_id"].to_numpy()
            Q = np.stack(block["hist"].to_numpy()).astype(np.int64)
            q_area = Q.sum(axis=1)
            m, n = Q.shape[0], R.shape[0]
            best = np.full((m, n), -1, np.int64)
            best_shift = np.zeros((m, n), np.int32)
            for s in range(bins):
                ov = np.minimum(Q[:, None, :],
                                shifted[s][None, :, :]).sum(-1)
                better = ov > best    # strict: keeps the FIRST arg-max
                best = np.where(better, ov, best)
                best_shift = np.where(better, np.int32(s), best_shift)
            match = best / np.maximum(q_area[:, None], r_area[None, :])
            hit = (match >= threshold) & (q_ids[:, None] < r_ids[None, :])
            ai, bj = np.nonzero(hit)
            yield pd.DataFrame({"id_a": q_ids[ai], "id_b": r_ids[bj],
                                "match": match[ai, bj],
                                "best_shift": best_shift[ai, bj]})

    return h.select("user_id", "hist").mapInPandas(
        blocks, f"id_a {id_type}, id_b {id_type}, match double, "
                "best_shift int")


def pch_circular_match_sql(spark: SparkSession, sf_dir: str,
                           bins: int = PCH_BINS,
                           threshold: float = PCH_MATCH_THRESHOLD
                           ) -> DataFrame:
    """Pure-expression (whole-stage-codegen) form of the matcher — same
    values, no Python in the plan; the broadcast-NumPy form above is the
    default because per-element codegen overhead dominates at >10^3
    entities."""
    h = event_hour_histograms(spark, sf_dir, bins)
    a = h.select(F.col("user_id").alias("id_a"), F.col("hist").alias("ha"),
                 F.col("area").alias("_aa"))
    b = h.select(F.col("user_id").alias("id_b"), F.col("hist").alias("hb"),
                 F.col("area").alias("_ab"))
    pairs = a.crossJoin(b).where(F.col("id_a") < F.col("id_b"))
    overlaps = F.expr(
        f"transform(sequence(0, {bins - 1}), s -> "
        f"aggregate(sequence(0, {bins - 1}), 0L, "
        f"(acc, i) -> acc + least(ha[i], hb[pmod(i + s, {bins})])))")
    scored = (pairs
              .withColumn("_ov", overlaps)
              .withColumn("_best", F.array_max("_ov"))
              .withColumn("match",
                          F.col("_best") / F.greatest("_aa", "_ab"))
              .withColumn("best_shift",
                          (F.array_position("_ov", F.col("_best")) - 1)
                          .cast("int")))
    return (scored.where(F.col("match") >= threshold)
            .select("id_a", "id_b", "match", "best_shift"))


def pch_oracle_sql(bins: int = PCH_BINS,
                   threshold: float = PCH_MATCH_THRESHOLD) -> str:
    """DuckDB replica of pch_circular_match (same integer histogram,
    same shift scan, same first-max tie-break)."""
    return f"""
        WITH e AS (
          SELECT user_id,
                 CAST(floor(epoch(ts) / 3600) AS BIGINT) % {bins} AS hr
          FROM events),
        ucnt AS (
          SELECT user_id, hr, count(*) AS c FROM e GROUP BY user_id, hr),
        dense AS (
          SELECT u.user_id, b.b, coalesce(ucnt.c, 0) AS c
          FROM (SELECT DISTINCT user_id FROM e) u
          CROSS JOIN (SELECT unnest(range(0, {bins})) AS b) b
          LEFT JOIN ucnt ON ucnt.user_id = u.user_id AND ucnt.hr = b.b),
        h AS (
          SELECT user_id,
                 list(c ORDER BY b) AS hist,
                 sum(c) AS area
          FROM dense GROUP BY user_id),
        pairs AS (
          SELECT a.user_id AS id_a, b.user_id AS id_b,
                 a.hist AS ha, b.hist AS hb,
                 greatest(a.area, b.area) AS ma
          FROM h a JOIN h b ON a.user_id < b.user_id),
        scored AS (
          SELECT id_a, id_b, ma,
                 list_transform(range(0, {bins}), s ->
                   list_sum(list_transform(range(0, {bins}), i ->
                     least(ha[i + 1], hb[((i + s) % {bins}) + 1]))))
                   AS ov
          FROM pairs)
        SELECT id_a, id_b,
               list_max(ov) / ma AS match,
               CAST(list_position(ov, list_max(ov)) - 1 AS INT)
                 AS best_shift
        FROM scored
        WHERE list_max(ov) / ma >= {threshold}
    """
