"""Stage checkpointing + per-partition lineage.

Reference analog: the fingerprint file cache — each resource's extracted
prints are written to a .tdb file and re-read instead of re-extracted
(PanakoStrategy.java:181-207), plus bulk load (OlafStrategy.java:623-664).
We generalize that to *per-stage* checkpoints so a 10^12-row run resumes
mid-pipeline (north_rule requirement).

Backend: Iceberg when the runtime jar is on the classpath (`writeTo(...)
.append()`); in this offline sandbox, a parquet directory + atomic JSON
manifest gives identical semantics:

    <root>/<table>/              parquet files
    <root>/_manifests/<table>.json   {"complete": true, rows, run_id, ...}

A stage is "done" iff its manifest says complete — a killed run leaves no
manifest, so the next run recomputes that stage only. Lineage rows
(stage, partition_id, input_count, signature_count, band_count,
elapsed_ms, run_id) append to <root>/lineage/.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

LINEAGE_COLUMNS = ["stage", "partition_id", "input_count",
                   "signature_count", "band_count", "elapsed_ms", "run_id"]


class CheckpointStore:
    def __init__(self, root: str, run_id: str | None = None):
        self.root = root
        self.run_id = run_id or uuid.uuid4().hex[:12]
        os.makedirs(os.path.join(root, "_manifests"), exist_ok=True)

    # ---- manifests ---------------------------------------------------------
    def _manifest_path(self, table: str) -> str:
        return os.path.join(self.root, "_manifests", f"{table}.json")

    def is_complete(self, table: str) -> bool:
        p = self._manifest_path(table)
        if not os.path.exists(p):
            return False
        try:
            with open(p) as f:
                return bool(json.load(f).get("complete"))
        except (json.JSONDecodeError, OSError):
            return False

    def _mark_complete(self, table: str, rows: int,
                       config_fp: str | None = None) -> None:
        p = self._manifest_path(table)
        tmp = p + f".tmp.{uuid.uuid4().hex[:6]}"
        with open(tmp, "w") as f:
            json.dump({"complete": True, "rows": rows, "table": table,
                       "run_id": self.run_id, "ts": time.time(),
                       "config_fp": config_fp}, f)
        os.replace(tmp, p)  # atomic on POSIX

    def manifest(self, table: str) -> dict:
        p = self._manifest_path(table)
        if not os.path.exists(p):
            return {}
        try:
            with open(p) as f:
                return json.load(f)
        except (json.JSONDecodeError, OSError):
            return {}

    def check_config_fp(self, table: str, config_fp: str) -> None:
        """Refuse to mix fingerprint formats in one store: appending
        prints extracted under a different extractor config (e.g.
        log_freq toggled — every landmark hash moves) would silently
        produce a store whose cross-boundary pairs never match."""
        stored = self.manifest(table).get("config_fp")
        if stored is not None and stored != config_fp:
            raise ValueError(
                f"checkpoint table '{table}' was written with extractor "
                f"config {stored}, current config is {config_fp}; "
                "re-extract the store (store.invalidate + full run) or "
                "restore the original config — appending would mix "
                "incompatible fingerprint formats.")

    def invalidate(self, table: str) -> None:
        p = self._manifest_path(table)
        if os.path.exists(p):
            os.remove(p)

    # ---- tables ------------------------------------------------------------
    def path(self, table: str) -> str:
        return os.path.join(self.root, table)

    def write(self, df: DataFrame, table: str,
              partition_by: list[str] | None = None,
              count_rows: bool = False,
              config_fp: str | None = None) -> int:
        """Overwrite-write a stage output and mark it complete.

        Row counting re-scans the output (one extra job per stage —
        driver-serial cost that caps scaling efficiency), so it is off by
        default; the manifest records -1 unless count_rows is set.
        config_fp stamps the extractor-config fingerprint for tables
        whose row format depends on it (prints/signatures).
        """
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(self.path(table))
        rows = -1
        if count_rows:
            rows = df.sparkSession.read.parquet(self.path(table)).count()
        self._mark_complete(table, rows, config_fp=config_fp)
        return rows

    def read(self, spark: SparkSession, table: str) -> DataFrame:
        return spark.read.parquet(self.path(table))

    def read_or_compute(self, spark: SparkSession, table: str,
                        compute, partition_by: list[str] | None = None
                        ) -> DataFrame:
        """The resume primitive: reuse a complete checkpoint, else compute,
        write, and re-read (so downstream stages scan parquet, not the
        whole upstream lineage)."""
        if self.is_complete(table):
            return self.read(spark, table)
        df = compute()
        self.write(df, table, partition_by)
        return self.read(spark, table)

    # ---- lineage -----------------------------------------------------------
    def append_lineage(self, df: DataFrame) -> None:
        """Append lineage rows (schema LINEAGE_COLUMNS)."""
        df.select(*LINEAGE_COLUMNS).write.mode("append").parquet(
            os.path.join(self.root, "lineage"))

    def read_lineage(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(os.path.join(self.root, "lineage"))
