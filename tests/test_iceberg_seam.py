"""Iceberg call-shape tests via the injected writer seam.

No Iceberg runtime jar resolves in the offline sandbox, so the real
commit path cannot execute here; these tests force the Iceberg branch
(`store._use_iceberg = True`) with a RECORDING fake writer and assert
the exact call sequences the branch issues — createOrReplace on first
write, append on incremental, append-then-create for lineage, the
row-level DELETE text, DROP TABLE on clear. A skipif-gated integration
test at the bottom runs the real catalog where the jar exists.

Reference analog: the KV storage engine is the reference's
most-exercised surface (PanakoStorageKV.java:123-228).
"""

from __future__ import annotations

import pytest

from panako_spark.config import PanakoConfig
from panako_spark.io.checkpoint import CheckpointStore, IcebergWriter, \
    iceberg_available


class RecordingWriter(IcebergWriter):
    """Records (method, table/name, extras) instead of touching a
    catalog; `fail_first_append` simulates the missing-table error the
    first lineage append hits."""

    def __init__(self, fail_first_append: bool = False):
        self.calls: list[tuple] = []
        self._fail_first_append = fail_first_append
        self.tables: dict[str, object] = {}

    def create_namespace(self, spark, catalog, namespace):
        self.calls.append(("create_namespace", f"{catalog}.{namespace}"))

    def create_or_replace(self, df, name, partition_by=None):
        self.calls.append(("create_or_replace", name, tuple(partition_by or ())))
        self.tables[name] = df

    def append(self, df, name):
        if name not in self.tables and self._fail_first_append:
            self.calls.append(("append_FAILED_no_table", name))
            raise RuntimeError(f"Table {name} not found")
        self.calls.append(("append", name))
        self.tables[name] = df

    def delete_ids(self, spark, name, ids_view):
        self.calls.append(
            ("sql", f"DELETE FROM {name} WHERE image_id IN "
                    f"(SELECT image_id FROM {ids_view})"))

    def drop_table(self, spark, name):
        self.calls.append(("sql", f"DROP TABLE IF EXISTS {name}"))


class RecordingWriterWithCreate(RecordingWriter):
    """Mirrors IcebergWriter.append_or_create's try-append-else-create
    sequencing with the fake's own create (the base class's create path
    is a real writeTo call that needs a catalog)."""

    def append_or_create(self, df, name):
        try:
            self.append(df, name)
        except Exception:
            self.calls.append(("create", name))
            self.tables[name] = df


def _forced_iceberg_store(tmp_path, writer) -> CheckpointStore:
    store = CheckpointStore(str(tmp_path), iceberg_writer=writer)
    store._use_iceberg = True  # branch under test; no catalog probing
    return store


def test_write_issues_create_or_replace(spark, tmp_path):
    w = RecordingWriter()
    store = _forced_iceberg_store(tmp_path, w)
    df = spark.range(3).withColumnRenamed("id", "x")
    store.write(df, "prints", partition_by=["x"])
    assert w.calls == [("create_or_replace",
                        store.qualified_name("prints"), ("x",))]
    assert store.is_complete("prints")


def test_lineage_append_then_create_on_missing_table(spark, tmp_path):
    w = RecordingWriterWithCreate(fail_first_append=True)
    store = _forced_iceberg_store(tmp_path, w)
    ldf = spark.createDataFrame(
        [("s", 0, 1, 1, 1, 1, "r")],
        "stage string, partition_id int, input_count long, "
        "signature_count long, band_count long, elapsed_ms long, "
        "run_id string")
    store.append_lineage(ldf)
    store.append_lineage(ldf)
    name = store.qualified_name("lineage")
    assert w.calls == [
        ("append_FAILED_no_table", name),   # first append: no table yet
        ("create", name),                   # -> create-on-first-append
        ("append", name),                   # second append: plain append
    ]


def test_delete_issues_row_level_delete_sql(spark, tmp_path):
    from panako_spark.operators.store_ops import delete_resources

    w = RecordingWriter()
    store = _forced_iceberg_store(tmp_path, w)
    # manifests must say the tables exist for delete to touch them
    store._mark_complete("prints", 10)
    store._mark_complete("signatures", 5)
    delete_resources(spark, store, ["img1", "img2"])
    sqls = [c[1] for c in w.calls if c[0] == "sql"]
    assert sqls == [
        f"DELETE FROM {store.qualified_name('prints')} WHERE image_id IN "
        "(SELECT image_id FROM _panako_delete_ids)",
        f"DELETE FROM {store.qualified_name('signatures')} WHERE image_id "
        "IN (SELECT image_id FROM _panako_delete_ids)",
    ]


def test_clear_drops_every_default_table(spark, tmp_path):
    from panako_spark.operators.store_ops import clear

    w = RecordingWriter()
    store = _forced_iceberg_store(tmp_path, w)
    clear(store, spark=spark)
    dropped = [c[1].rsplit(".", 1)[1] for c in w.calls if c[0] == "sql"]
    # fused_pairs MUST be here: run_pipeline checkpoints the signature
    # channels under that name, and a clear() that misses it leaves a
    # stale complete manifest a rerun would silently reuse
    assert dropped == ["extracted", "prints", "signatures", "verified",
                       "fused_pairs", "tile_pairs", "dup_pairs", "clusters"]


def test_incremental_create_then_append(spark, tmp_path, monkeypatch):
    """First store_incremental createOrReplaces both tables; the second
    call must APPEND (atomic commits), never replace."""
    from panako_spark.data.synth import generate_corpus, rows_to_pandas
    from panako_spark.operators import store_ops

    w = RecordingWriter()
    store = _forced_iceberg_store(tmp_path, w)
    cfg = PanakoConfig()
    rows, _ = generate_corpus(2, 0.0, seed=11)
    images_a = spark.createDataFrame(rows_to_pandas(rows))
    out = store_ops.store_incremental(spark, images_a, store, cfg)
    assert out["new_images"] == 2
    assert [c[0] for c in w.calls] == ["create_or_replace",
                                      "create_or_replace"]

    # second batch: store.read must come from the fake's tables
    monkeypatch.setattr(
        CheckpointStore, "read",
        lambda self, spark_, table: w.tables[self.qualified_name(table)])
    rows_b, _ = generate_corpus(4, 0.0, seed=12)
    images_b = spark.createDataFrame(rows_to_pandas(rows_b))
    out2 = store_ops.store_incremental(spark, images_b, store, cfg)
    assert out2["new_images"] > 0
    assert [c[0] for c in w.calls[2:]] == ["append", "append"]


def _have_real_iceberg(spark) -> bool:
    return iceberg_available(spark, "panako")


def test_real_catalog_roundtrip(spark, tmp_path):
    """Integration: only runs where the Iceberg runtime jar + catalog
    conf exist (never in this offline sandbox)."""
    if not _have_real_iceberg(spark):
        pytest.skip("no Iceberg runtime/catalog in this environment")
    store = CheckpointStore(str(tmp_path), backend="iceberg")
    df = spark.range(5).withColumnRenamed("id", "x")
    store.write(df, "t")
    assert store.read(spark, "t").count() == 5
    from panako_spark.operators.store_ops import clear

    clear(store, tables=["t"], spark=spark)
