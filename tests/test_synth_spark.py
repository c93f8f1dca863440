"""Spark-parallel corpus generator: determinism and schema contract."""

import tempfile

import pyspark.sql.functions as F

from panako_spark.data.synth import rows_for_base_index, write_corpus_spark


def _checksum(df):
    return df.select(
        F.sum(F.xxhash64("image_id", "bytes", "w", "h", "fmt", "caption",
                         "phash")).alias("h")).collect()[0]["h"]


def test_partitioning_independent_content(spark):
    """Different file/partition layouts must produce byte-identical rows —
    the property that makes a cluster-parallel generator legitimate for
    a fixed-input scaling comparison."""
    d1 = tempfile.mkdtemp(prefix="synthspark1_")
    d2 = tempfile.mkdtemp(prefix="synthspark2_")
    write_corpus_spark(spark, d1, 40, dup_fraction=0.5, seed=99, n_files=8)
    write_corpus_spark(spark, d2, 40, dup_fraction=0.5, seed=99, n_files=3)
    a = spark.read.parquet(d1)
    b = spark.read.parquet(d2)
    assert a.count() == b.count() > 40  # bases + dups
    assert _checksum(a) == _checksum(b)


def test_rows_match_local_kernel(spark):
    """A row read back from the Spark write equals the locally generated
    one for the same base index (same seed path)."""
    d = tempfile.mkdtemp(prefix="synthspark3_")
    write_corpus_spark(spark, d, 10, dup_fraction=0.0, seed=7, n_files=2)
    got = {r["image_id"]: r for r in spark.read.parquet(d).collect()}
    local = rows_for_base_index(3, n_dup_base=0, seed=7)[0]
    row = got[local.image_id]
    assert bytes(row["bytes"]) == local.bytes
    assert (row["w"], row["h"], row["fmt"], row["caption"], row["phash"]) \
        == (local.w, local.h, local.fmt, local.caption, local.phash)


def test_schema_matches_input_hint(spark):
    d = tempfile.mkdtemp(prefix="synthspark4_")
    write_corpus_spark(spark, d, 5, seed=1, n_files=1)
    df = spark.read.parquet(d)
    assert df.schema.simpleString() == (
        "struct<image_id:string,bytes:binary,w:int,h:int,fmt:string,"
        "caption:string,phash:bigint>")
