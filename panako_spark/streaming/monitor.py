"""Streaming monitor: the reference's `monitor`/`Monitor` mode
(Monitor.java:61-110, PanakoStrategy.java:498-510 — continuous querying of
incoming fragments against a stored index) re-expressed as Structured
Streaming.

Reference semantics: each incoming window is an INDEPENDENT query against
the store — no watermarks, no cross-window state (SURVEY.md §2.5). That
maps exactly to `readStream` + `foreachBatch`: every micro-batch runs the
batch extract -> near-hash probe -> verify flow against the static prints
checkpoint, appending matches to a sink. Streaming checkpointing gives
exactly-once per micro-batch, the streaming analog of the batch pipeline's
stage manifests.

At cluster scale the stored prints side stays partitioned by hash on disk;
each micro-batch's probe side is small, so AQE broadcasts it — the stored
table is never re-shuffled per batch.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.types as T

from panako_spark.config import PanakoConfig
from panako_spark.stages.extract import run_extract, split_prints
from panako_spark.stages.verify import run_verify

IMAGE_SCHEMA = T.StructType([
    T.StructField("image_id", T.StringType()),
    T.StructField("bytes", T.BinaryType()),
    T.StructField("w", T.IntegerType()),
    T.StructField("h", T.IntegerType()),
    T.StructField("fmt", T.StringType()),
    T.StructField("caption", T.StringType()),
    T.StructField("phash", T.LongType()),
])


def probe_batch(batch_images: DataFrame, stored_prints: DataFrame,
                cfg: PanakoConfig) -> DataFrame:
    """One monitor query: extract the batch, ±range-probe the store,
    verify. Returns matches (query_id, ref_id, score, factors...).

    Direction is fixed (query -> store), like the reference's monitor;
    `avoid` (Q2) is the self-id filter.
    """
    q_prints = split_prints(run_extract(batch_images, cfg))
    r = cfg.query_range
    probe = q_prints.select(
        F.col("image_id").alias("id_a"),
        F.col("t1").alias("a_t"), F.col("f1").alias("a_f"),
        F.explode(F.sequence(F.col("hash") - r, F.col("hash") + r))
        .alias("probe_hash"))
    ref = stored_prints.select(
        F.col("image_id").alias("id_b"),
        F.col("hash").alias("probe_hash"),
        F.col("t1").alias("b_t"), F.col("f1").alias("b_f"))
    hits = (probe.join(ref, "probe_hash")
            .where(F.col("id_a") != F.col("id_b"))  # avoid-set (Q2)
            .select("id_a", "id_b", "a_t", "a_f", "b_t", "b_f"))
    verified = run_verify(hits, cfg)
    return verified.select(
        F.col("id_a").alias("query_id"), F.col("id_b").alias("ref_id"),
        "score", "time_factor", "freq_factor", "coverage")


def start_monitor(spark: SparkSession, input_dir: str, prints_path: str,
                  output_dir: str, checkpoint_dir: str,
                  cfg: PanakoConfig | None = None,
                  available_now: bool = True):
    """Watch input_dir for image parquet files; emit matches vs the stored
    prints table to output_dir. Returns the StreamingQuery."""
    cfg = cfg or PanakoConfig()
    stored = spark.read.parquet(prints_path)

    stream = (spark.readStream.schema(IMAGE_SCHEMA)
              .option("maxFilesPerTrigger", 4)
              .parquet(input_dir))

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        matches = probe_batch(batch_df, stored, cfg)
        (matches.withColumn("batch_id", F.lit(batch_id))
         .write.mode("append").parquet(output_dir))

    writer = (stream.writeStream.foreachBatch(handle)
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
