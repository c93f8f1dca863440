"""Document-dedup operator family over the `documents` table.

The distributed MinHash/SimHash signature computation reused from the
caption pipeline (kernels are shared), exposed as standalone operators a
training-data pipeline would run. Signature values are not expressible in
ANSI SQL (splitmix64 wrapping arithmetic), so these are rows-only checks
in the driver contract; the oracle-checkable exact siblings are
functions/text.ngram_jaccard_pairs and prefix_dup_groups.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame, SparkSession

from panako_spark.config import PanakoConfig
from panako_spark.kernels.minhash import (
    band_keys, hash_shingles, minhash_signature_batch, token_shingles,
)
from panako_spark.kernels.simhash import simhash_band_keys, simhash_batch

DOC_SIG_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("minhash", T.ArrayType(T.LongType())),
    T.StructField("mh_bands", T.ArrayType(T.LongType())),
    T.StructField("simhash", T.LongType()),
    T.StructField("sh_bands", T.ArrayType(T.LongType())),
])


def doc_signatures(spark: SparkSession, sf_dir: str,
                   cfg: PanakoConfig | None = None) -> DataFrame:
    """documents -> MinHash-128 signature + SimHash-64 + band keys, one
    vectorized mapInPandas pass (Arrow batches, batched NumPy kernels)."""
    cfg = cfg or PanakoConfig()

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in it:
            lists = [hash_shingles(token_shingles(t or "",
                                                  cfg.minhash_shingle))
                     for t in batch["text"]]
            sigs = minhash_signature_batch(lists, cfg)
            sims = simhash_batch(lists)
            yield pd.DataFrame({
                "doc_id": batch["doc_id"].astype("int64"),
                "minhash": [s.astype(np.int64) for s in sigs],
                "mh_bands": list(band_keys(sigs.view(np.uint64), cfg)),
                "simhash": sims,
                "sh_bands": list(simhash_band_keys(sims, cfg)),
            })

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select("doc_id", "text").mapInPandas(fn, DOC_SIG_SCHEMA)


def minhash_dup_pairs(spark: SparkSession, sf_dir: str,
                      cfg: PanakoConfig | None = None) -> DataFrame:
    """MinHash-LSH near-dup pairs on documents (band collision + signature
    Jaccard estimate >= threshold) — the scale path the exact
    ngram_jaccard_pairs oracles."""
    cfg = cfg or PanakoConfig()
    sigs = doc_signatures(spark, sf_dir, cfg)
    keyed = sigs.select(F.col("doc_id").alias("image_id"),
                        F.explode("mh_bands").alias("key"))
    from panako_spark.stages.candidates import pairs_from_keys
    cand, _ = pairs_from_keys(keyed, cfg.band_pair_cap)
    a = sigs.select(F.col("doc_id").alias("id_a"),
                    F.col("minhash").alias("_ma"))
    b = sigs.select(F.col("doc_id").alias("id_b"),
                    F.col("minhash").alias("_mb"))
    return (cand.join(a, "id_a").join(b, "id_b")
            .withColumn("jaccard_est",
                        F.aggregate(F.zip_with("_ma", "_mb",
                                               lambda x, y: (x == y)
                                               .cast("int")),
                                    F.lit(0), lambda acc, v: acc + v)
                        / F.lit(cfg.minhash_perms))
            .where(F.col("jaccard_est") >= cfg.minhash_jaccard_threshold)
            .select("id_a", "id_b", "jaccard_est"))


def simhash_dup_pairs(spark: SparkSession, sf_dir: str,
                      cfg: PanakoConfig | None = None) -> DataFrame:
    cfg = cfg or PanakoConfig()
    sigs = doc_signatures(spark, sf_dir, cfg)
    keyed = sigs.select(F.col("doc_id").alias("image_id"),
                        F.explode("sh_bands").alias("key"))
    from panako_spark.stages.candidates import pairs_from_keys
    cand, _ = pairs_from_keys(keyed, cfg.band_pair_cap)
    s = sigs.select("doc_id", "simhash")
    a = s.select(F.col("doc_id").alias("id_a"), F.col("simhash").alias("_sa"))
    b = s.select(F.col("doc_id").alias("id_b"), F.col("simhash").alias("_sb"))
    return (cand.join(a, "id_a").join(b, "id_b")
            .withColumn("hamming",
                        F.bit_count(F.col("_sa").bitwiseXOR(F.col("_sb"))))
            .where(F.col("hamming") <= cfg.simhash_hamming_threshold)
            .select("id_a", "id_b", "hamming"))
