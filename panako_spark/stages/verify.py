"""Landmark verify stage: per-pair alignment kernel over grouped hits.

The reference's per-candidate match loop Q5-Q13 (PanakoStrategy.java:
349-475) runs as ONE aggregation + ONE batched Python pass:

    hits.groupBy(id_a, id_b)
        .agg(count, collect_list(a_t), ... )     -- JVM hash-agg, partial
        .where(count >= min_unfiltered_hits)     -- Q5 as HAVING
        .mapInPandas(verify_batches)             -- NumPy kernel per batch

Design notes (measured on the sf bench):
  * grouping into array columns + mapInPandas beats applyInPandas here:
    the Python worker sees one Arrow batch of many pairs instead of one
    pandas DataFrame per pair, removing per-group overhead.
  * the Q5 gate rides the same aggregation (no second shuffle, and
    map-side partial aggregation shrinks the shuffle).
  * the hit relation is symmetric (|h_a - h_b| <= range), so hits are
    stored once per canonical pair (id_a < id_b) and the kernel tries
    both query orientations — the union the reference's dedup driver
    produces by querying every file (Deduplication.java:98-108).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
import pyspark.sql.types as T

from panako_spark.config import PanakoConfig
from panako_spark.kernels.verify import verify_pair

VERIFIED_SCHEMA = T.StructType([
    T.StructField("id_a", T.StringType()),
    T.StructField("id_b", T.StringType()),
    T.StructField("score", T.IntegerType()),
    T.StructField("time_factor", T.DoubleType()),
    T.StructField("freq_factor", T.DoubleType()),
    T.StructField("coverage", T.DoubleType()),
    T.StructField("q_start", T.IntegerType()),
    T.StructField("q_stop", T.IntegerType()),
])


def make_verify_batches(cfg: PanakoConfig):
    def verify_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in it:
            out = {k: [] for k in ("id_a", "id_b", "score", "time_factor",
                                   "freq_factor", "coverage", "q_start",
                                   "q_stop")}
            for row in batch.itertuples(index=False):
                a_t = np.asarray(row.a_ts, dtype=np.int64)
                a_f = np.asarray(row.a_fs, dtype=np.int64)
                b_t = np.asarray(row.b_ts, dtype=np.int64)
                b_f = np.asarray(row.b_fs, dtype=np.int64)
                res = verify_pair(a_t, a_f, b_t, b_f, cfg)
                rev = verify_pair(b_t, b_f, a_t, a_f, cfg)
                best = max((r for r in (res, rev) if r is not None),
                           key=lambda r: r.score, default=None)
                if best is None:
                    continue
                out["id_a"].append(row.id_a)
                out["id_b"].append(row.id_b)
                out["score"].append(best.score)
                out["time_factor"].append(best.time_factor)
                out["freq_factor"].append(best.freq_factor)
                out["coverage"].append(best.coverage)
                out["q_start"].append(best.q_start)
                out["q_stop"].append(best.q_stop)
            yield pd.DataFrame(out) if out["id_a"] else pd.DataFrame(
                {k: pd.Series([], dtype=d) for k, d in (
                    ("id_a", "str"), ("id_b", "str"), ("score", "int32"),
                    ("time_factor", "float64"), ("freq_factor", "float64"),
                    ("coverage", "float64"), ("q_start", "int32"),
                    ("q_stop", "int32"))})

    return verify_batches


def run_verify(hits: DataFrame, cfg: PanakoConfig) -> DataFrame:
    """hits(id_a, id_b, a_t, a_f, b_t, b_f) -> verified pairs with score."""
    grouped = (hits.groupBy("id_a", "id_b")
               .agg(F.count("*").alias("_n"),
                    F.collect_list("a_t").alias("a_ts"),
                    F.collect_list("a_f").alias("a_fs"),
                    F.collect_list("b_t").alias("b_ts"),
                    F.collect_list("b_f").alias("b_fs"))
               .where(F.col("_n") >= cfg.min_unfiltered_hits))  # Q5
    return grouped.mapInPandas(make_verify_batches(cfg), VERIFIED_SCHEMA)
