"""Iceberg-shaped table adapter: snapshot-pinned reads, atomic commits,
copy-on-write MERGE — the seam between this pipeline and a real
lakehouse catalog.

The north rule reads "Iceberg snapshots … resumes at partition
granularity"; in this sandbox no Iceberg runtime is installed, so the
rest of the repo reads plain parquet and derives snapshot ids from file
listings (webx/lineage.py:snapshot_id_for_path). This module is the
*written adapter*: one table abstraction with the Iceberg operation
set, two backends.

* ``backend="local"`` (default here) implements REAL snapshot semantics
  over parquet + JSON manifests — not a mock. Layout::

      <table>/data/commit-<n>-…/part-*.parquet   immutable data files
      <table>/metadata/snap-<n>.json             manifest: file list +
                                                 parent + operation
      <table>/metadata/current                   pointer (atomic rename)

  Commits write data files FIRST, then publish a new manifest, then
  atomically swap the ``current`` pointer (``os.replace``) — a crash at
  any earlier step leaves the previous snapshot intact and the orphaned
  files invisible (Iceberg's write-audit-publish shape). Reads pin a
  manifest, so a reader holding snapshot N is isolated from any number
  of later commits (time travel = pass ``snapshot_id``). MERGE is
  copy-on-write at file granularity: only data files that actually
  contain matched keys are rewritten; untouched files are SHARED
  between the parent and child snapshots (structurally asserted in
  tests/test_iceberg.py).

* ``backend="iceberg"`` delegates to a Spark Iceberg catalog: reads go
  through ``spark.read.format("iceberg")`` (``snapshot-id`` option =
  ``VERSION AS OF``), commits through ``DataFrameWriterV2`` append /
  overwritePartitions, MERGE through ``MERGE INTO`` SQL, and snapshot
  ids read back from the catalog's ``<table>.history`` /
  ``<table>.snapshots`` metadata tables (public Iceberg-Spark surface).
  No Iceberg runtime ships in this sandbox, so the delegation is tested
  against a stub catalog session (tests/test_iceberg.py monkeypatches
  ``spark.sql`` and the writer) — the call surface is identical to the
  local backend, so jobs written against :class:`SnapshotTable` move to
  a real cluster unchanged.

Concurrency contract: single-writer per table (the Iceberg catalog's
CAS is what multi-writer needs; a filesystem rename cannot express it).
The publish step still verifies the parent pointer right before the
swap and raises ``ConcurrentCommitError`` on a detected race — a
best-effort tripwire, not a lock.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass
from typing import List, Optional

from pyspark.sql import DataFrame, SparkSession, functions as F


class ConcurrentCommitError(RuntimeError):
    pass


def _meta_dir(path: str) -> str:
    return os.path.join(path, "metadata")


def _data_files(d: str) -> List[str]:
    return sorted(
        os.path.join(d, f)
        for f in os.listdir(d)
        if f.endswith(".parquet") and not f.startswith((".", "_"))
    )


@dataclass
class SnapshotTable:
    """One logical table with Iceberg operation semantics."""

    path: str
    backend: str = "local"
    iceberg_table: Optional[str] = None  # catalog.db.table for backend="iceberg"
    spark: Optional[SparkSession] = None  # catalog session for backend="iceberg"

    # ------------------------------------------------------------ metadata
    def _manifest_path(self, sid: int) -> str:
        return os.path.join(_meta_dir(self.path), f"snap-{sid:08d}.json")

    def _read_manifest(self, sid: int) -> dict:
        with open(self._manifest_path(sid)) as f:
            return json.load(f)

    def _catalog_table(self) -> str:
        return self.iceberg_table or self.path

    def _spark_for_catalog(self, spark: Optional[SparkSession]) -> SparkSession:
        s = spark or self.spark
        if s is None:
            raise ValueError(
                "backend='iceberg' needs a SparkSession with the Iceberg "
                "catalog extension: pass spark= on the table or the call"
            )
        return s

    def current_snapshot_id(
        self, spark: Optional[SparkSession] = None
    ) -> Optional[int]:
        """Latest committed snapshot id, or None for an empty table. For
        ``backend="iceberg"`` this is the last row of the catalog's
        ``<table>.history`` metadata table (made_current_at order) — the
        same readback every commit path uses to return its new id."""
        if self.backend == "iceberg":
            s = self._spark_for_catalog(spark)
            rows = s.sql(
                f"SELECT snapshot_id FROM {self._catalog_table()}.history "
                "ORDER BY made_current_at DESC LIMIT 1"
            ).collect()
            return int(rows[0][0]) if rows else None
        cur = os.path.join(_meta_dir(self.path), "current")
        try:
            with open(cur) as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return None

    def snapshots(self, spark: Optional[SparkSession] = None) -> List[dict]:
        """All committed manifests, oldest first (the .snapshots view)."""
        if self.backend == "iceberg":
            s = self._spark_for_catalog(spark)
            rows = s.sql(
                "SELECT snapshot_id, parent_id, operation FROM "
                f"{self._catalog_table()}.snapshots ORDER BY committed_at"
            ).collect()
            return [
                {
                    "snapshot_id": r["snapshot_id"],
                    "parent_id": r["parent_id"],
                    "operation": r["operation"],
                }
                for r in rows
            ]
        md = _meta_dir(self.path)
        if not os.path.isdir(md):
            return []
        out = []
        for nm in sorted(os.listdir(md)):
            if nm.startswith("snap-") and nm.endswith(".json"):
                with open(os.path.join(md, nm)) as f:
                    out.append(json.load(f))
        cur = self.current_snapshot_id()
        return [m for m in out if m["snapshot_id"] <= (cur or 0)]

    # ------------------------------------------------------------ read
    def read(self, spark: SparkSession, snapshot_id: Optional[int] = None) -> DataFrame:
        """Snapshot-pinned read. Default = current; pass ``snapshot_id``
        for time travel (Iceberg's ``VERSION AS OF``)."""
        if self.backend == "iceberg":
            reader = spark.read.format("iceberg")
            if snapshot_id is not None:
                reader = reader.option("snapshot-id", snapshot_id)
            return reader.load(self.iceberg_table or self.path)
        sid = snapshot_id if snapshot_id is not None else self.current_snapshot_id()
        if sid is None:
            raise FileNotFoundError(f"{self.path}: no committed snapshot")
        files = self._read_manifest(sid)["files"]
        if not files:
            # empty snapshot: schema comes from the manifest record
            from pyspark.sql.types import StructType

            schema = StructType.fromJson(
                json.loads(self._read_manifest(sid)["schema_json"])
            )
            return spark.createDataFrame([], schema)
        return spark.read.parquet(*files)

    # ------------------------------------------------------------ commits
    def _write_data_files(self, df: DataFrame, next_sid: int) -> List[str]:
        d = os.path.join(
            self.path, "data", f"commit-{next_sid:08d}-{uuid.uuid4().hex[:8]}"
        )
        df.write.mode("error").parquet(d)
        return _data_files(d)

    def _publish(
        self,
        files: List[str],
        operation: str,
        expected_parent: Optional[int],
        schema_json: str,
    ) -> int:
        md = _meta_dir(self.path)
        os.makedirs(md, exist_ok=True)
        if self.current_snapshot_id() != expected_parent:
            raise ConcurrentCommitError(
                f"{self.path}: parent moved from {expected_parent} to "
                f"{self.current_snapshot_id()} during commit"
            )
        sid = (expected_parent or 0) + 1
        manifest = {
            "snapshot_id": sid,
            "parent_id": expected_parent,
            "operation": operation,
            "files": files,
            "schema_json": schema_json,
        }
        mp = self._manifest_path(sid)
        tmp = mp + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, mp)
        ptmp = os.path.join(md, f"current.tmp.{uuid.uuid4().hex[:8]}")
        with open(ptmp, "w") as f:
            f.write(str(sid))
        os.replace(ptmp, os.path.join(md, "current"))  # the atomic publish
        return sid

    def commit_append(self, df: DataFrame) -> int:
        """Append ``df`` as a new snapshot → new snapshot id."""
        if self.backend == "iceberg":
            df.writeTo(self._catalog_table()).append()
            return self.current_snapshot_id(df.sparkSession)
        parent = self.current_snapshot_id()
        new_files = self._write_data_files(df, (parent or 0) + 1)
        prev = self._read_manifest(parent)["files"] if parent else []
        return self._publish(
            prev + new_files, "append", parent, df.schema.json()
        )

    def commit_overwrite(self, df: DataFrame) -> int:
        """Replace the table contents as a new snapshot (time travel to
        the parent still sees the old rows — nothing is deleted)."""
        if self.backend == "iceberg":
            df.writeTo(self._catalog_table()).overwritePartitions()
            return self.current_snapshot_id(df.sparkSession)
        parent = self.current_snapshot_id()
        new_files = self._write_data_files(df, (parent or 0) + 1)
        return self._publish(
            new_files, "overwrite", parent, df.schema.json()
        )

    def merge_upsert(
        self, spark: SparkSession, updates: DataFrame, key: str
    ) -> int:
        """Copy-on-write MERGE (``WHEN MATCHED UPDATE, WHEN NOT MATCHED
        INSERT``): rewrite ONLY the data files that contain a matched
        key; every untouched file is carried into the child snapshot
        by reference. The file→key probe is one broadcast semi-join
        over ``input_file_name()`` — never a full-table rewrite."""
        if self.backend == "iceberg":
            s = self._spark_for_catalog(spark)
            view = f"__webx_merge_src_{uuid.uuid4().hex[:8]}"
            updates.createOrReplaceTempView(view)
            try:
                s.sql(
                    f"MERGE INTO {self._catalog_table()} AS t "
                    f"USING {view} AS u ON t.{key} = u.{key} "
                    "WHEN MATCHED THEN UPDATE SET * "
                    "WHEN NOT MATCHED THEN INSERT *"
                )
            finally:
                s.catalog.dropTempView(view)
            return self.current_snapshot_id(s)
        parent = self.current_snapshot_id()
        if parent is None:
            return self.commit_append(updates)
        manifest = self._read_manifest(parent)
        cur = spark.read.parquet(*manifest["files"]).withColumn(
            "__file", F.input_file_name()
        )
        keys = updates.select(key).distinct()
        touched = [
            r["__file"]
            for r in cur.join(F.broadcast(keys), key, "left_semi")
            .select("__file")
            .distinct()
            .collect()
        ]
        # paths come back as file: URIs; normalize to os paths
        from urllib.parse import unquote, urlparse

        touched_set = {
            unquote(urlparse(t).path) if "://" in t or t.startswith("file:") else t
            for t in touched
        }
        untouched = [f for f in manifest["files"] if f not in touched_set]
        survivors = (
            spark.read.parquet(*sorted(touched_set)).join(
                F.broadcast(keys), key, "left_anti"
            )
            if touched_set
            else None
        )
        rewritten = (
            survivors.unionByName(updates) if survivors is not None else updates
        )
        new_files = self._write_data_files(rewritten, parent + 1)
        return self._publish(
            untouched + new_files, "merge", parent, updates.schema.json()
        )

    # ------------------------------------------------------------ maintenance
    def expire_snapshots(self, keep_last: int = 1) -> List[int]:
        """Drop manifests older than the newest ``keep_last`` and delete
        data files no retained snapshot references (Iceberg's
        expire_snapshots + orphan cleanup). Returns expired ids."""
        snaps = self.snapshots()
        if len(snaps) <= keep_last:
            return []
        keep = snaps[-keep_last:]
        drop = snaps[:-keep_last]
        live = {f for m in keep for f in m["files"]}
        dead = {f for m in drop for f in m["files"]} - live
        for f in dead:
            try:
                os.remove(f)
            except FileNotFoundError:
                pass
        for m in drop:
            os.remove(self._manifest_path(m["snapshot_id"]))
        return [m["snapshot_id"] for m in drop]
