"""Text-analysis operators for a large-scale training-data pipeline,
over the driver's `documents` table. All JVM-side built-ins (split /
higher-order array functions / regexp) — no Python UDFs; these run inside
whole-stage codegen at 100 TB.

Each has a DuckDB oracle in __spark_entry__.py.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

# "stopwords" for the synthetic corpus vocabulary (documents are built from
# SQL-ish words; these are its most frequent tokens)
STOPWORDS = ("table", "value", "row", "a", "the", "data", "key")
_STOP_SQL = ", ".join(f"'{w}'" for w in STOPWORDS)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token counting + char stats (pipeline 'token counting')."""
    return _docs(spark, sf_dir).select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).alias("n_tokens"),
        F.length("text").alias("n_chars"))


def token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish tokenization: word pieces [a-z0-9]+ plus single non-space
    punctuation — the regex both Spark (Java regex) and DuckDB (RE2)
    interpret identically, so the count is oracle-checkable."""
    pat = "[a-z0-9]+|[^a-z0-9 ]"
    return _docs(spark, sf_dir).select(
        "doc_id",
        F.size(F.regexp_extract_all(F.lower("text"), F.lit(pat), F.lit(0)))
        .cast("long").alias("n_bpe_tokens"))


def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: mean token length + stopword ratio (length/punct/
    stopword-ratio heuristics of a data-quality pass)."""
    d = _docs(spark, sf_dir).withColumn(
        "_toks", F.split(F.col("text"), " "))
    return d.select(
        "doc_id",
        (F.length("text") / F.size("_toks")).alias("mean_token_len"),
        (F.size(F.expr(
            f"filter(_toks, x -> x IN ({_STOP_SQL}))"))
         / F.size("_toks")).alias("stopword_ratio"))


def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: stopword-hit ratio thresholding (n-gram
    heuristic degenerate form; the synthetic corpus is single-language so
    the interesting part is the deterministic ratio computation)."""
    q = quality_score(spark, sf_dir)
    return q.select(
        "doc_id",
        F.when(F.col("stopword_ratio") >= 0.05, F.lit("en"))
        .otherwise(F.lit("unk")).alias("lang_guess"))


def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: first-8-token prefix key (rolling-hash
    winnowing analog expressible in pure SQL for the oracle check; the
    real rolling-hash channel lives in kernels/suffix.py)."""
    return (_docs(spark, sf_dir)
            .select("doc_id",
                    F.array_join(F.slice(F.split(F.col("text"), " "), 1, 8),
                                 " ").alias("prefix_key")))


def prefix_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-dedup-by-key demo on the prefix fingerprint (Q18 file-hash
    mode, Deduplication.java:66-88): groups with >1 member."""
    return (doc_fingerprint(spark, sf_dir)
            .groupBy("prefix_key")
            .agg(F.count("*").alias("n_docs"))
            .where(F.col("n_docs") > 1))


def exact_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact content dedup: hash the full text, keep groups of size > 1
    (the reference's file-hash dedup mode, Deduplication.java:66-88 /
    FileUtils.getFileHash). md5 is used as the content key because the
    DuckDB oracle computes the identical digest; at scale the groupBy is
    a plain hash-agg with map-side partials.

    The synthetic documents table contains no exact duplicates, which
    made the oracle check vacuous (0 rows on both sides). The query
    therefore PLANTS deterministic duplicates inline — every 25th doc is
    cloned under doc_id + 10^7 — so the comparison exercises non-empty
    groups; the DuckDB oracle plants the identical rows."""
    d = _docs(spark, sf_dir)
    planted = (d.where(F.col("doc_id") % 25 == 0)
               .select((F.col("doc_id") + 10_000_000).alias("doc_id"),
                       "text"))
    return (d.select("doc_id", "text").unionByName(planted)
            .select("doc_id", F.md5(F.col("text")).alias("content_key"))
            .groupBy("content_key")
            .agg(F.count("*").alias("n_docs"),
                 F.min("doc_id").alias("rep_doc"))
            .where(F.col("n_docs") > 1))


MAX_SHINGLE_DF = 1000  # shared by the Spark operator AND the DuckDB oracle


def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str,
                        threshold: float = 0.5,
                        max_shingle_df: int = MAX_SHINGLE_DF,
                        stats_out: list | None = None) -> DataFrame:
    """n-gram Jaccard near-dup pairs, exact (not MinHash): explode distinct
    3-gram shingles, self-join on shingle, |A∩B| / (|A|+|B|-|A∩B|).

    This is the exact-answer sibling of the MinHash channel — at 100 TB
    you run MinHash; the exact version is the oracle-checkable operator.

    Skew guard (the same hot-key discipline as candidates.pairs_from_keys):
    a single boilerplate 3-gram shared by k docs makes k^2/2 self-join
    rows, so shingles whose document frequency exceeds `max_shingle_df`
    are dropped from BOTH the intersection and the per-doc set sizes —
    i.e. Jaccard is computed over the non-ubiquitous shingle vocabulary,
    a well-defined semantics the DuckDB oracle replicates with the same
    cap (never a silent approximation). `stats_out`, when given, receives
    a 1-row DataFrame (n_shingles, n_hot_shingles,
    dropped_cross_pairs_estimate) the pipeline appends to lineage.
    The default cap is far above the bench corpora's max df (25 at
    sf0.1) and caps the per-shingle join fanout at ~0.5M rows at any
    corpus size.
    """
    d = (_docs(spark, sf_dir)
         .select("doc_id", F.split("text", " ").alias("t"))
         .where(F.size("t") >= 3))
    sh_all = (d.select(
        "doc_id",
        F.explode(F.expr(
            "transform(sequence(0, size(t) - 3), "
            "i -> concat_ws(' ', t[i], t[i+1], t[i+2]))")).alias("s"))
        .distinct())
    dfreq = sh_all.groupBy("s").agg(F.count("*").alias("_df"))
    hot = dfreq.where(F.col("_df") > max_shingle_df).select("s", "_df")
    if stats_out is not None:
        stats_out.append(dfreq.agg(
            F.count("*").alias("n_shingles"),
            F.count(F.when(F.col("_df") > max_shingle_df, 1))
            .alias("n_hot_shingles"),
            F.coalesce(F.sum(F.when(
                F.col("_df") > max_shingle_df,
                (F.col("_df") * (F.col("_df") - 1) / 2).cast("long"))),
                F.lit(0)).alias("dropped_cross_pairs_estimate")))
    sh = sh_all.join(F.broadcast(hot.select("s")), "s", "left_anti")
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = sh.select(F.col("doc_id").alias("id_a"), "s")
    b = sh.select(F.col("doc_id").alias("id_b"), "s")
    inter = (a.join(b, "s").where(F.col("id_a") < F.col("id_b"))
             .groupBy("id_a", "id_b").agg(F.count("*").alias("inter")))
    na = sizes.select(F.col("doc_id").alias("id_a"), F.col("n").alias("na"))
    nb = sizes.select(F.col("doc_id").alias("id_b"), F.col("n").alias("nb"))
    return (inter.join(na, "id_a").join(nb, "id_b")
            .withColumn("jaccard", F.col("inter")
                        / (F.col("na") + F.col("nb") - F.col("inter")))
            .where(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard"))
