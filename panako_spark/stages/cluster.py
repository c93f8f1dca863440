"""Connected components: iterative large-star / small-star on DataFrames.

north_star: "verified pairs are clustered by an iterative
large-star/small-star connected-components loop on DataFrames". Algorithm
from Kiveris et al., "Connected Components in MapReduce and Beyond"
(SOCC'14) — O(log n) rounds even on path graphs, no collect_list (the
per-node neighbor set is never materialized; both stars are a groupBy-min
plus a re-join, so the hottest node costs one shuffle row per edge).

No GraphFrames dependency (SURVEY.md §4 custom-work item 2). Each round is
localCheckpoint()ed to truncate lineage; convergence = edge multiset
checksum stable. Labels are component minima (deterministic, matches the
union-find golden in kernels/matcher.py).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect every larger neighbor of u to u's min neighborhood label.

    No trailing distinct: the following small-star's groupBy-min is
    duplicate-insensitive and its own output IS distinct, so within a
    round duplicates only inflate one join's input — cheaper than the
    extra full shuffle a distinct here costs (one fewer stage per round;
    the driver-synchronized round count is the scaling-limiting term).
    """
    sym = edges.union(edges.select(F.col("dst").alias("src"),
                                   F.col("src").alias("dst")))
    mins = (sym.groupBy("src")
            .agg(F.min("dst").alias("_m"))
            .select("src", F.least("src", "_m").alias("_m")))
    return (sym.join(mins, "src")
            .where(F.col("dst") > F.col("src"))
            .select(F.col("dst").alias("src"), F.col("_m").alias("dst"))
            .union(mins.where(F.col("src") != F.col("_m"))
                   .select("src", F.col("_m").alias("dst"))))


def _small_star(edges: DataFrame) -> DataFrame:
    """Point all smaller-or-equal neighbors at the minimum."""
    directed = edges.select(F.greatest("src", "dst").alias("src"),
                            F.least("src", "dst").alias("dst"))
    mins = directed.groupBy("src").agg(F.min("dst").alias("_m"))
    return (directed.join(mins, "src")
            .where(F.col("dst") != F.col("_m"))
            .select(F.col("dst").alias("src"), F.col("_m").alias("dst"))
            .union(mins.select("src", F.col("_m").alias("dst")))
            .distinct())


def _checksum(edges: DataFrame) -> tuple[int, int]:
    row = edges.agg(
        F.count("*").alias("n"),
        F.coalesce(F.sum(F.pmod(F.xxhash64("src", "dst"),
                                F.lit(1_000_000_007))), F.lit(0)).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def connected_components(pairs: DataFrame, all_ids: DataFrame,
                         max_iterations: int = 20) -> DataFrame:
    """pairs(id_a, id_b) + all_ids(image_id) -> (image_id, cluster_id).

    cluster_id = min image_id of the component; singletons label themselves.

    The edge relation is orders of magnitude smaller than the pipeline's
    hit exchanges (verified pairs, not hits), but each star round plans
    4-5 shuffles, so at the session's exchange-sized shuffle-partition
    count (256 at bench scale) a converged loop schedules thousands of
    near-empty reduce tasks whose dispatch latency serializes on the
    driver — measured 15.8 s -> 52.9 s wall at 69.7k images when the
    session went 32 -> 256 partitions. The loop therefore caps
    spark.sql.shuffle.partitions at 32 for its own rounds (restored
    after the last materializing action; the lazy label join left for
    the caller is one tiny AQE-coalesced shuffle either way). The cap
    is NOT thread-safe vs concurrent planning on the same session —
    run_pipeline calls this after the concurrent branches have joined.
    """
    spark = pairs.sparkSession
    conf_key = "spark.sql.shuffle.partitions"
    orig_parts = spark.conf.get(conf_key, "32")
    cc_parts = min(int(orig_parts), 32)
    edges = (pairs.select(F.col("id_a").alias("src"),
                          F.col("id_b").alias("dst"))
             .where(F.col("src") != F.col("dst")).distinct()
             .localCheckpoint(eager=False))
    prev = None
    done = 0
    first_check = True
    spark.conf.set(conf_key, str(cc_parts))
    try:
        edges, labels = _cc_loop(edges, prev, done, first_check,
                                 max_iterations)
    finally:
        spark.conf.set(conf_key, orig_parts)
    # after convergence every non-min node points directly at the component
    # min; minima and isolated nodes label themselves
    return (all_ids.select("image_id")
            .join(labels, "image_id", "left")
            .select("image_id",
                    F.coalesce("cluster_id", "image_id").alias("cluster_id")))


def _cc_loop(edges: DataFrame, prev, done: int, first_check: bool,
             max_iterations: int):
    while done < max_iterations:
        # batch star rounds per driver synchronization: the checksum
        # collect is the only action (it materializes the lazy
        # checkpoint as a side effect). Typical graphs converge in 2-3
        # rounds, so the first check comes after 3 and subsequent checks
        # every 2 — at a fixpoint extra rounds are idempotent no-ops, so
        # batched detection costs at most one wasted round while cutting
        # the driver-synchronized round trips (the core-count-
        # independent term of this loop) by 2-3x.
        batch = 3 if first_check else 2
        first_check = False
        for _ in range(min(batch, max_iterations - done)):
            edges = (_small_star(_large_star(edges))
                     .localCheckpoint(eager=False))
            done += 1
        cur = _checksum(edges)
        if cur == prev:
            break
        prev = cur
    labels = (edges.groupBy(F.col("src").alias("image_id"))
              .agg(F.min("dst").alias("cluster_id")))
    # materialize the labels while the partition cap is still in force —
    # groupBy on the checkpointed edges is the loop's last real shuffle
    labels = labels.localCheckpoint(eager=True)
    return edges, labels
