"""Landmark verify stage: per-pair alignment kernel over grouped hits.

The reference's per-candidate match loop Q5-Q13 (PanakoStrategy.java:
349-475) runs as ONE shuffle + ONE batched Python pass:

    hits.repartition(id_a, id_b)            -- single hash exchange
        .sortWithinPartitions(id_a, id_b)   -- pairs become contiguous runs
        .mapInPandas(verify_batches)        -- flat int columns, NumPy kernel

Design notes (measured on the bench corpus; the previous design used
groupBy + 4x collect_list + a Q5 HAVING join, which built per-group
object arrays in the JVM — the object hash aggregate dominated stage
time and its GC pressure slowed every later stage in the same JVM):
  * flat int columns ride Arrow's fast path; nothing is ever assembled
    into JVM list objects.
  * the Q5 gate (>= min_unfiltered_hits raw hits) runs INSIDE the kernel,
    vectorized over segment lengths — no gate aggregation, no second
    shuffle, no join, and gated-out segments cost one comparison.
  * a pair's run can straddle Arrow batch boundaries within a partition;
    the kernel carries the tail segment into the next batch. Partition
    boundaries can't split a pair (hash-partitioned on the pair key).
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

def verified_schema(id_type: T.DataType = T.StringType()) -> T.StructType:
    return T.StructType([
        T.StructField("id_a", id_type),
        T.StructField("id_b", id_type),
        T.StructField("score", T.IntegerType()),
        T.StructField("time_factor", T.DoubleType()),
        T.StructField("freq_factor", T.DoubleType()),
        T.StructField("coverage", T.DoubleType()),
        T.StructField("q_start", T.IntegerType()),
        T.StructField("q_stop", T.IntegerType()),
    ])


VERIFIED_SCHEMA = verified_schema()

_FIELDS = ("id_a", "id_b", "score", "time_factor", "freq_factor",
           "coverage", "q_start", "q_stop")
_TAIL_DTYPES = ("int32", "float64", "float64", "float64", "int32", "int32")


def _segments(ids_a: np.ndarray, ids_b: np.ndarray) -> np.ndarray:
    """Start offsets of contiguous (id_a, id_b) runs, plus the end offset."""
    n = ids_a.size
    if n == 0:
        return np.zeros(1, np.int64)
    change = np.flatnonzero((ids_a[1:] != ids_a[:-1])
                            | (ids_b[1:] != ids_b[:-1])) + 1
    return np.concatenate(([0], change, [n]))


def make_verify_batches(cfg: PanakoConfig, numeric_ids: bool = False):
    min_hits = cfg.min_unfiltered_hits
    id_dtype = "int64" if numeric_ids else "str"
    dtypes = dict(zip(_FIELDS, (id_dtype, id_dtype) + _TAIL_DTYPES))

    def _emit(rows: list) -> pd.DataFrame:
        if not rows:
            return pd.DataFrame(
                {k: pd.Series([], dtype=d) for k, d in dtypes.items()})
        cols = list(zip(*rows))
        return pd.DataFrame({k: c for k, c in zip(_FIELDS, cols)})

    def _process(ids_a, ids_b, a_t, a_f, b_t, b_f, rows: list) -> None:
        bounds = _segments(ids_a, ids_b)
        lens = np.diff(bounds)
        # Q5 vectorized: only segments with enough raw hits reach Python
        for si in np.flatnonzero(lens >= min_hits):
            lo, hi = bounds[si], bounds[si + 1]
            res = verify_pair(a_t[lo:hi], a_f[lo:hi],
                              b_t[lo:hi], b_f[lo:hi], cfg)
            rev = verify_pair(b_t[lo:hi], b_f[lo:hi],
                              a_t[lo:hi], a_f[lo:hi], cfg)
            best = max((r for r in (res, rev) if r is not None),
                       key=lambda r: r.score, default=None)
            if best is not None:
                rows.append((ids_a[lo], ids_b[lo], best.score,
                             best.time_factor, best.freq_factor,
                             best.coverage, best.q_start, best.q_stop))

    def verify_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        carry: pd.DataFrame | None = None
        for batch in it:
            if carry is not None:
                batch = pd.concat([carry, batch], ignore_index=True)
            ids_a = batch["id_a"].to_numpy()
            ids_b = batch["id_b"].to_numpy()
            n = len(batch)
            # keep the last run as carry — it may continue in the next batch
            last_start = 0
            if n:
                same = (ids_a == ids_a[-1]) & (ids_b == ids_b[-1])
                last_start = int(n - same[::-1].argmin()
                                 if not same.all() else 0)
            carry = batch.iloc[last_start:]
            head = batch.iloc[:last_start]
            rows: list = []
            if len(head):
                _process(head["id_a"].to_numpy(), head["id_b"].to_numpy(),
                         head["a_t"].to_numpy(np.int64),
                         head["a_f"].to_numpy(np.int64),
                         head["b_t"].to_numpy(np.int64),
                         head["b_f"].to_numpy(np.int64), rows)
            yield _emit(rows)
        if carry is not None and len(carry):
            rows = []
            _process(carry["id_a"].to_numpy(), carry["id_b"].to_numpy(),
                     carry["a_t"].to_numpy(np.int64),
                     carry["a_f"].to_numpy(np.int64),
                     carry["b_t"].to_numpy(np.int64),
                     carry["b_f"].to_numpy(np.int64), rows)
            yield _emit(rows)

    return verify_batches


def run_verify(hits: DataFrame, cfg: PanakoConfig,
               partitions: int | None = None,
               numeric_ids: bool = False) -> DataFrame:
    """hits(id_a, id_b, a_t, a_f, b_t, b_f) -> verified pairs with score.

    One hash exchange on the pair key + a partition-local sort; the Q5
    gate and the Q6-Q13 alignment kernel run in a single Python pass over
    flat Arrow columns. With numeric_ids the id columns are int64 (see
    landmark_hits) — the shuffle, sort, and Arrow transfer all run on
    fixed-width keys.
    """
    n = partitions or cfg.shuffle_partitions
    clustered = (hits.repartition(n, "id_a", "id_b")
                 .sortWithinPartitions("id_a", "id_b"))
    schema = verified_schema(T.LongType() if numeric_ids else T.StringType())
    return clustered.mapInPandas(
        make_verify_batches(cfg, numeric_ids=numeric_ids), schema)
