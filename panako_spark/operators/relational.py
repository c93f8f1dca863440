"""SQL-expressible relational operators from SURVEY.md §2, implemented
Spark-first over the driver's TPC-H-ish tables.

Each function here has a matching ANSI-SQL oracle in __spark_entry__.py
(oracle_sql) that DuckDB runs on the same parquet — the driver's
correctness gate. Column aliases match the oracle exactly (the compare
sorts columns by name and hashes values).

Operator mapping (reference file:line in each docstring):
  S9  stats scan            -> stats_scan
  Q1  near-hash range join  -> near_hash_band_join
  Q2  avoid-set filter      -> avoid_filter
  Q5  min-hits gate         -> min_hits_gate
  Q7  head/tail sublists    -> head_tail_sublist
  Q8  mode of ΔT            -> delta_t_mode
  Q13 coverage histogram    -> coverage_histogram
  Q14 monitor windows       -> windowed_monitor
  Q16 top-k per group       -> topk_per_group
  Q20 metadata lookup join  -> resource_lookup_join
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def stats_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9: full-scan totals/min/max/avg (PanakoStorageKV.java:382-467).
    Quantities are integral-valued doubles, so sums are order-exact."""
    return _t(spark, sf_dir, "lineitem").agg(
        F.count("*").alias("n_rows"),
        F.sum("l_quantity").alias("sum_qty"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        F.avg("l_quantity").alias("avg_qty"),
    )


def min_hits_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5: HAVING count >= K (PanakoStrategy.java:349-361, K=10 analog)."""
    return (_t(spark, sf_dir, "lineitem")
            .groupBy("l_orderkey")
            .agg(F.count("*").alias("n_hits"))
            .where(F.col("n_hits") >= 5))


def head_tail_sublist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7: first & last k elements per group, by a total order
    (PanakoStrategy.java:369-373; k=min(250, max(10, n/5)) -> k=2 here)."""
    li = (_t(spark, sf_dir, "lineitem")
          .select("l_orderkey", "l_linenumber").distinct())
    asc = Window.partitionBy("l_orderkey").orderBy(F.col("l_linenumber").asc())
    desc = Window.partitionBy("l_orderkey").orderBy(F.col("l_linenumber").desc())
    return (li.withColumn("_ra", F.row_number().over(asc))
            .withColumn("_rd", F.row_number().over(desc))
            .where((F.col("_ra") <= 2) | (F.col("_rd") <= 2))
            .select("l_orderkey", "l_linenumber"))


def delta_t_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8: histogram argmax per group, ties -> smallest value
    (mostCommonDeltaTforHitList, PanakoStrategy.java:263-282)."""
    ev = _t(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("_n"))
    w = Window.partitionBy("user_id").orderBy(F.col("_n").desc(),
                                              F.col("event_type").asc())
    return (counts.withColumn("_r", F.row_number().over(w))
            .where(F.col("_r") == 1)
            .select("user_id", F.col("event_type").alias("mode_event")))


def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16: score-desc top-k truncation (PanakoStrategy.java:481-495)."""
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(),
                                                F.col("o_orderkey").asc())
    return (_t(spark, sf_dir, "orders")
            .withColumn("rnk", F.row_number().over(w))
            .where(F.col("rnk") <= 3)
            .select("o_custkey", "o_orderkey", "rnk"))


def near_hash_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1: ±2 near-key join via key-expansion explode -> equi-join
    (PanakoStorageKV.java:293-379 re-expressed; SURVEY.md §4 item 1).
    Catalyst turns this into a plain shuffled hash join; the 5x fanout is
    on the probe side only."""
    part = _t(spark, sf_dir, "part").select(
        "p_partkey",
        (F.col("p_partkey") * F.lit(2654435761) % F.lit(1000)).alias("h"))
    probe = part.select(F.col("p_partkey").alias("id_a"),
                        F.explode(F.sequence(F.col("h") - 2, F.col("h") + 2))
                        .alias("h"))
    ref = part.select(F.col("p_partkey").alias("id_b"), "h")
    return (probe.join(ref, "h")
            .where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b").distinct())


def avoid_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2: avoid-set exclusion as an anti-join
    (PanakoStorageKV.java:329-333; Deduplication.java:102-107)."""
    high = (_t(spark, sf_dir, "orders")
            .where(F.col("o_totalprice") > 450000)
            .select(F.col("o_custkey").alias("c_custkey")).distinct())
    return (_t(spark, sf_dir, "customer")
            .join(high, "c_custkey", "left_anti")
            .select("c_custkey"))


def resource_lookup_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20: id -> metadata lookup join (PanakoStrategy.java:530-533),
    broadcast the small dimension side."""
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_quantity")
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    return (li.join(F.broadcast(part),
                    li.l_partkey == part.p_partkey)
            .groupBy("p_brand")
            .agg(F.count("*").alias("n_items"),
                 F.sum("l_quantity").alias("sum_qty")))


def coverage_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13: percent-of-units-with-matches coverage
    (PanakoStrategy.java:441-475): distinct 1-hour bins / span bins."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", F.floor(F.unix_timestamp("ts") / 3600).alias("hr"))
    return (ev.groupBy("user_id")
            .agg(F.countDistinct("hr").alias("filled_hours"),
                 (F.max("hr") - F.min("hr") + 1).alias("span_hours"))
            .withColumn("coverage",
                        F.col("filled_hours") / F.col("span_hours"))
            .select("user_id", "filled_hours", "span_hours", "coverage"))


def windowed_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14: monitor's fixed windows (PanakoStrategy.java:498-510; 25s/20s
    step -> 20-min tumbling buckets here)."""
    ev = _t(spark, sf_dir, "events").select(
        F.floor(F.unix_timestamp("ts") / 1200).alias("bucket"),
        "user_id", "value")
    # sum in integer cents: order-independent exact arithmetic (double
    # summation order differs engine-to-engine)
    return (ev.groupBy("bucket")
            .agg(F.count("*").alias("n_events"),
                 F.countDistinct("user_id").alias("n_users"),
                 (F.sum(F.round(F.col("value") * 100).cast("long")) / 100.0)
                 .alias("sum_value")))
