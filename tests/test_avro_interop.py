"""Cross-validate avro_lite against the OFFICIAL Apache Avro Java
implementation (org.apache.avro, the 1.12 jars Spark itself ships in
pyspark/jars, driven through the session JVM via py4j).

VERDICT r4 noted "no independent Avro reader exists to cross-validate
the codec" — avro_lite had only been verified against itself plus
structural layout checks. These tests close that: files written by
avro_lite are decoded by the reference Java DataFileReader (including
the REAL Iceberg manifest/manifest-list files a lite table commit
produces), and files written by the reference Java DataFileWriter are
decoded by avro_lite. Any byte-level divergence from the Avro spec
(varint zigzag, union indexing, block/sync framing, header metadata
map) fails these tests on one side or the other.
"""

from __future__ import annotations

import json
import math

import pytest
from pyspark.sql import functions as F

from panako_spark.io import avro_lite
from panako_spark.io.iceberg_lite import IcebergLiteWriter, IcebergLiteTable


# ------------------------------------------------------------ JVM helpers --
def _jvm_has_avro(spark) -> bool:
    try:
        spark._jvm.org.apache.avro.Schema.Parser()
        return True
    except Exception:
        return False


def _read_with_java(spark, path: str):
    """Decode an Avro container file with org.apache.avro's
    DataFileReader -> (schema_json, [GenericRecord, ...])."""
    jvm = spark._jvm
    reader = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(path),
        jvm.org.apache.avro.generic.GenericDatumReader())
    schema = json.loads(reader.getSchema().toString())
    recs = []
    while reader.hasNext():
        recs.append(reader.next())
    reader.close()
    return schema, recs


def _jbytes(obj) -> bytes:
    """java.nio.ByteBuffer (avro 'bytes') or GenericFixed -> bytes.

    py4j proxies resolve ANY attribute name to a JavaMember, so
    hasattr() can't distinguish the two — dispatch on the Java class.
    """
    if "Fixed" in obj.getClass().getName():   # GenericData.Fixed
        return bytes(obj.bytes())
    # avro's decoder returns heap ByteBuffers; honor offset/position
    arr = bytes(obj.array())
    off = obj.arrayOffset() + obj.position()
    return arr[off:off + obj.remaining()]


def _jstr(obj) -> str:                 # org.apache.avro.util.Utf8
    return obj.toString() if hasattr(obj, "toString") else str(obj)


# A schema exercising every type avro_lite implements (field-id style
# custom attributes included, as Iceberg metadata schemas carry them).
FULL_SCHEMA = {
    "type": "record", "name": "everything", "fields": [
        {"name": "b", "type": "boolean"},
        {"name": "i", "type": "int"},
        {"name": "l", "type": "long"},
        {"name": "f", "type": "float"},
        {"name": "d", "type": "double"},
        {"name": "s", "type": "string"},
        {"name": "by", "type": "bytes"},
        {"name": "fx", "type": {"type": "fixed", "name": "f16",
                                "size": 5}},
        {"name": "u", "type": ["null", "long"], "field-id": 7},
        {"name": "arr", "type": {"type": "array", "items": "long"}},
        {"name": "m", "type": {"type": "map", "values": "string"}},
        {"name": "nest", "type": {
            "type": "record", "name": "inner", "fields": [
                {"name": "x", "type": "long"},
                {"name": "y", "type": ["null", "string"]}]}},
    ]}

ROWS = [
    {"b": True, "i": -1, "l": (1 << 62) + 3, "f": 1.5, "d": -2.25,
     "s": "héllo ☃", "by": b"\x00\xffraw", "fx": b"12345",
     "u": None, "arr": [1, -2, 3], "m": {"k1": "v1", "k2": "v2"},
     "nest": {"x": -(1 << 40), "y": "deep"}},
    {"b": False, "i": 2147483647, "l": -(1 << 63), "f": -0.0, "d": 1e300,
     "s": "", "by": b"", "fx": b"\x00\x00\x00\x00\x00",
     "u": 42, "arr": [], "m": {},
     "nest": {"x": 0, "y": None}},
]


@pytest.fixture(scope="module")
def jvm_avro(spark):
    if not _jvm_has_avro(spark):
        pytest.skip("org.apache.avro not on the session JVM classpath")
    return spark


# ------------------------------------------------------------------- tests --
def test_java_reads_lite_written_container_all_types(jvm_avro, tmp_path):
    spark = jvm_avro
    p = str(tmp_path / "full.avro")
    avro_lite.write_container(p, FULL_SCHEMA, ROWS,
                              metadata={"custom-meta": b"yes"})
    schema, recs = _read_with_java(spark, p)
    assert schema["name"] == "everything"
    assert [f["name"] for f in schema["fields"]] == \
        [f["name"] for f in FULL_SCHEMA["fields"]]
    assert len(recs) == len(ROWS)
    for rec, want in zip(recs, ROWS):
        assert bool(rec.get("b")) == want["b"]
        assert rec.get("i") == want["i"]
        assert rec.get("l") == want["l"]
        assert math.isclose(rec.get("f"), want["f"], abs_tol=1e-6)
        assert rec.get("d") == want["d"]
        assert _jstr(rec.get("s")) == want["s"]
        assert _jbytes(rec.get("by")) == want["by"]
        assert _jbytes(rec.get("fx")) == want["fx"]
        u = rec.get("u")
        assert (None if u is None else u) == want["u"]
        assert list(rec.get("arr")) == want["arr"]
        m = rec.get("m")
        assert {_jstr(k): _jstr(m.get(k)) for k in m.keySet()} \
            == want["m"]
        nest = rec.get("nest")
        assert nest.get("x") == want["nest"]["x"]
        y = nest.get("y")
        assert (None if y is None else _jstr(y)) == want["nest"]["y"]


def test_java_reads_lite_empty_container(jvm_avro, tmp_path):
    p = str(tmp_path / "empty.avro")
    avro_lite.write_container(p, FULL_SCHEMA, [])
    schema, recs = _read_with_java(jvm_avro, p)
    assert schema["name"] == "everything" and recs == []


def test_lite_reads_java_written_container(jvm_avro, tmp_path):
    """Reverse direction: the reference Java DataFileWriter produces a
    file (its own framing, its own varints, multi-record block) and
    avro_lite must decode it byte-exactly."""
    spark = jvm_avro
    jvm = spark._jvm
    schema_json = json.dumps({
        "type": "record", "name": "jside", "fields": [
            {"name": "l", "type": "long"},
            {"name": "s", "type": "string"},
            {"name": "by", "type": "bytes"},
            {"name": "u", "type": ["null", "long"]},
            {"name": "d", "type": "double"},
        ]})
    sch = jvm.org.apache.avro.Schema.Parser().parse(schema_json)
    w = jvm.org.apache.avro.file.DataFileWriter(
        jvm.org.apache.avro.generic.GenericDatumWriter(sch))
    p = str(tmp_path / "java.avro")
    w.create(sch, jvm.java.io.File(p))
    want = []
    for i, (lv, sv, bv, uv, dv) in enumerate([
            ((1 << 45) + 7, "alpha", b"\x01\x02", None, 0.5),
            (-(1 << 50), "βeta", b"", (1 << 33), -123.75)]):
        rec = jvm.org.apache.avro.generic.GenericData.Record(sch)
        # py4j maps small Python ints to java.lang.Integer, which the
        # avro long writer rejects — the > 2^31 magnitudes above force
        # java.lang.Long on the wire, exercising real long encoding
        rec.put("l", lv)
        rec.put("s", sv)
        rec.put("by", jvm.java.nio.ByteBuffer.wrap(bytearray(bv)))
        rec.put("u", uv)
        rec.put("d", dv)
        w.append(rec)
        want.append({"l": lv, "s": sv, "by": bv, "u": uv, "d": dv})
    w.close()
    rschema, recs, meta = avro_lite.read_container(p)
    assert rschema["name"] == "jside"
    # Java's DataFileWriter omits avro.codec entirely when no codec is
    # configured; per spec both "absent" and "null" mean uncompressed.
    assert meta.get("avro.codec", b"null") == b"null"
    assert recs == want


def test_java_reads_real_iceberg_lite_manifests(jvm_avro, tmp_path):
    """The production artifacts themselves: commit a lite table, then
    decode its manifest-list and manifest Avro files with the official
    Java reader and cross-check against avro_lite's own decoding."""
    spark = jvm_avro
    df = spark.range(37).select(
        F.concat(F.lit("img"), F.col("id")).alias("image_id"),
        (F.col("id") * 11).alias("hash"))
    w = IcebergLiteWriter(str(tmp_path))
    w.create_or_replace(df, "panako.ns.t")
    snap = IcebergLiteTable(
        str(tmp_path / "ns" / "t")).metadata()["snapshots"][-1]

    lschema, jlist = _read_with_java(spark, snap["manifest-list"])
    _, plist, _ = avro_lite.read_container(snap["manifest-list"])
    assert lschema["name"] == "manifest_file"
    # field-id custom attributes survive the Java parser round-trip
    by_name = {f["name"]: f for f in lschema["fields"]}
    assert by_name["manifest_path"]["field-id"] == 500
    assert len(jlist) == len(plist) >= 1
    for jrec, prec in zip(jlist, plist):
        assert _jstr(jrec.get("manifest_path")) == prec["manifest_path"]
        assert jrec.get("manifest_length") == prec["manifest_length"]
        assert jrec.get("added_snapshot_id") == prec["added_snapshot_id"]

    mschema, jentries = _read_with_java(spark, plist[0]["manifest_path"])
    _, pentries, _ = avro_lite.read_container(plist[0]["manifest_path"])
    assert mschema["name"] == "manifest_entry"
    assert len(jentries) == len(pentries) >= 1
    total = 0
    for jrec, prec in zip(jentries, pentries):
        jdf, pdf = jrec.get("data_file"), prec["data_file"]
        assert _jstr(jdf.get("file_path")) == pdf["file_path"]
        assert jdf.get("record_count") == pdf["record_count"]
        assert jrec.get("snapshot_id") == prec["snapshot_id"]
        total += jdf.get("record_count")
    assert total == 37
