"""Landmark verify stage: per-pair alignment kernel over grouped hits.

The reference's per-candidate loop body Q5-Q13 (PanakoStrategy.java:349-475)
fused into ONE `applyInPandas` grouped-map kernel — the only Python on the
hot path after extract, operating on NumPy arrays per (id_a, id_b) group.

The hit relation is symmetric but verification is directional (the line is
fit in query coordinates); the reference's dedup driver effectively tries
both directions (each file is queried against the store,
Deduplication.java:98-108), so the kernel runs both orientations and keeps
the better match — identical to the golden matcher's union.
"""

from __future__ import annotations

import pandas as pd
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


def make_verify_fn(cfg: PanakoConfig):
    def verify_group(pdf: pd.DataFrame) -> pd.DataFrame:
        a_t = pdf["a_t"].to_numpy()
        a_f = pdf["a_f"].to_numpy()
        b_t = pdf["b_t"].to_numpy()
        b_f = pdf["b_f"].to_numpy()
        res = verify_pair(a_t, a_f, b_t, b_f, cfg)
        rev = verify_pair(b_t, b_f, a_t, a_f, cfg)
        best = max((r for r in (res, rev) if r is not None),
                   key=lambda r: r.score, default=None)
        if best is None:
            return pd.DataFrame(columns=[f.name for f in VERIFIED_SCHEMA])
        return pd.DataFrame([{
            "id_a": pdf["id_a"].iloc[0],
            "id_b": pdf["id_b"].iloc[0],
            "score": best.score,
            "time_factor": best.time_factor,
            "freq_factor": best.freq_factor,
            "coverage": best.coverage,
            "q_start": best.q_start,
            "q_stop": best.q_stop,
        }])

    return verify_group


def run_verify(hits: DataFrame, cfg: PanakoConfig) -> DataFrame:
    """hits(id_a, id_b, a_t, a_f, b_t, b_f) -> verified pairs with score."""
    return (hits.groupBy("id_a", "id_b")
            .applyInPandas(make_verify_fn(cfg), VERIFIED_SCHEMA))
