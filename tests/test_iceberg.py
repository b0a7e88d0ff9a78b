"""SnapshotTable (webx/iceberg.py) — real snapshot semantics over the
local parquet+manifest backend: isolation, time travel, file-granular
copy-on-write MERGE, crash safety of the write-audit-publish order, and
snapshot expiry."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from webx.iceberg import ConcurrentCommitError, SnapshotTable


def _rows(df):
    return sorted(map(tuple, df.select("k", "v").collect()))


def _mk(spark, data):
    return spark.createDataFrame(data, "k long, v string")


def test_append_isolation_and_time_travel(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    s1 = t.commit_append(_mk(spark, [(1, "a"), (2, "b")]))
    pinned = t.read(spark, snapshot_id=s1)
    s2 = t.commit_append(_mk(spark, [(3, "c")]))
    assert (s1, s2) == (1, 2)
    # the pinned reader is isolated from the later commit
    assert _rows(pinned) == [(1, "a"), (2, "b")]
    assert _rows(t.read(spark)) == [(1, "a"), (2, "b"), (3, "c")]
    # explicit time travel
    assert _rows(t.read(spark, snapshot_id=s1)) == [(1, "a"), (2, "b")]
    ops = [m["operation"] for m in t.snapshots()]
    assert ops == ["append", "append"]


def test_overwrite_keeps_history(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    s1 = t.commit_append(_mk(spark, [(1, "a")]))
    s2 = t.commit_overwrite(_mk(spark, [(9, "z")]))
    assert _rows(t.read(spark)) == [(9, "z")]
    assert _rows(t.read(spark, snapshot_id=s1)) == [(1, "a")]
    assert t.current_snapshot_id() == s2


def test_merge_rewrites_only_touched_files(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    # two separate commits -> at least two distinct data files
    t.commit_append(_mk(spark, [(1, "a"), (2, "b")]).coalesce(1))
    s2 = t.commit_append(_mk(spark, [(3, "c"), (4, "d")]).coalesce(1))
    before = set(t._read_manifest(s2)["files"])
    s3 = t.merge_upsert(spark, _mk(spark, [(4, "D"), (5, "e")]), key="k")
    after = set(t._read_manifest(s3)["files"])
    # upsert applied: update existing key, insert new key
    assert _rows(t.read(spark)) == [
        (1, "a"), (2, "b"), (3, "c"), (4, "D"), (5, "e")
    ]
    # the file holding keys {1,2} is SHARED (carried by reference);
    # the file holding key 4 was rewritten
    shared = before & after
    assert shared, "untouched files must be shared between snapshots"
    assert before - after, "touched files must be replaced"
    # parent snapshot unchanged (CoW, not in-place)
    assert _rows(t.read(spark, snapshot_id=s2)) == [
        (1, "a"), (2, "b"), (3, "c"), (4, "d")
    ]


def test_merge_into_empty_table(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    t.merge_upsert(spark, _mk(spark, [(1, "a")]), key="k")
    assert _rows(t.read(spark)) == [(1, "a")]


def test_unpublished_files_are_invisible(spark, tmp_path):
    """Crash between data write and publish: reader sees the old
    snapshot — the write-audit-publish order."""
    t = SnapshotTable(str(tmp_path / "t"))
    t.commit_append(_mk(spark, [(1, "a")]))
    # simulate the crash: data files land, no manifest/pointer update
    t._write_data_files(_mk(spark, [(99, "zz")]), next_sid=2)
    assert _rows(t.read(spark)) == [(1, "a")]
    assert t.current_snapshot_id() == 1


def test_concurrent_commit_tripwire(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    t.commit_append(_mk(spark, [(1, "a")]))
    files = t._write_data_files(_mk(spark, [(2, "b")]), next_sid=2)
    with pytest.raises(ConcurrentCommitError):
        # stale parent: claims the table is still empty
        t._publish(files, "append", expected_parent=None, schema_json="{}")


def test_expire_snapshots_deletes_orphans(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    t.commit_append(_mk(spark, [(1, "a")]).coalesce(1))
    s2 = t.commit_overwrite(_mk(spark, [(2, "b")]).coalesce(1))
    old_files = set(t._read_manifest(1)["files"])
    live_files = set(t._read_manifest(s2)["files"])
    expired = t.expire_snapshots(keep_last=1)
    assert expired == [1]
    for f in old_files - live_files:
        assert not os.path.exists(f)
    for f in live_files:
        assert os.path.exists(f)
    assert _rows(t.read(spark)) == [(2, "b")]
    with pytest.raises(FileNotFoundError):
        t._read_manifest(1)


def test_lineage_snapshot_id_integration(spark, tmp_path):
    """The resume discipline (webx/lineage.py) keys completed work on
    (run_id, input_snapshot_id); with SnapshotTable the id is the
    manifest id — stable across re-reads, changed by any commit."""
    t = SnapshotTable(str(tmp_path / "t"))
    s1 = t.commit_append(_mk(spark, [(1, "a")]))
    assert t.current_snapshot_id() == s1 == t.current_snapshot_id()
    s2 = t.commit_append(_mk(spark, [(2, "b")]))
    assert s2 != s1


def test_checkpointed_extraction_over_snapshot_table(spark, tmp_path):
    """End-to-end seam: pages live in a SnapshotTable, the resume key is
    the manifest snapshot id. Same snapshot -> resume skips everything;
    a new commit -> new id -> nothing is wrongly skipped."""
    from tests.conftest import SF_SMALL
    from webx import synth
    from webx.config import ExtractConfig
    from webx.lineage import CheckpointStore, run_checkpointed_extraction

    t = SnapshotTable(str(tmp_path / "pages"))
    s1 = t.commit_append(synth.synth_pages(spark, SF_SMALL))
    store = CheckpointStore(str(tmp_path / "ckpt"))
    out = str(tmp_path / "out")
    cfg = ExtractConfig()
    done = run_checkpointed_extraction(
        spark, t.read(spark, s1), out, store, "r", f"snap-{s1}", cfg,
        n_partitions=4, chunk_size=4,
    )
    assert sorted(done) == [0, 1, 2, 3]
    # same snapshot: fully resumed, zero work
    assert run_checkpointed_extraction(
        spark, t.read(spark, s1), out, store, "r", f"snap-{s1}", cfg,
        n_partitions=4,
    ) == []
    # a new commit moves the snapshot id: the old lineage must NOT mask it
    s2 = t.commit_append(synth.synth_pages(spark, SF_SMALL).limit(0))
    assert s2 != s1
    redo = run_checkpointed_extraction(
        spark, t.read(spark, s2), out, store, "r", f"snap-{s2}", cfg,
        n_partitions=4, chunk_size=4,
    )
    assert sorted(redo) == [0, 1, 2, 3]


# ---------------------------------------------------------------- iceberg
# backend="iceberg" delegation, tested against a STUB catalog session
# (no Iceberg runtime ships in this sandbox): the stub records every SQL
# statement and writer call and serves the catalog metadata tables
# (<t>.history / <t>.snapshots) from an in-memory snapshot log, so the
# commit → snapshot-id-readback round trip is exercised end-to-end.


class _Row(dict):
    def __getitem__(self, k):
        if isinstance(k, int):
            return list(self.values())[k]
        return dict.__getitem__(self, k)


class _StubResult:
    def __init__(self, rows):
        self._rows = rows

    def collect(self):
        return [_Row(r) for r in self._rows]


class _StubCatalogSession:
    """Just enough of SparkSession for the iceberg-backend code paths."""

    def __init__(self):
        self.snaps = []  # [{snapshot_id, parent_id, operation}]
        self.sql_log = []
        self.catalog = self

    # catalog shim
    def dropTempView(self, name):
        self.sql_log.append(f"DROP_VIEW {name}")

    def _commit(self, operation):
        parent = self.snaps[-1]["snapshot_id"] if self.snaps else None
        sid = (parent or 100) + 1
        self.snaps.append(
            {"snapshot_id": sid, "parent_id": parent, "operation": operation}
        )

    def sql(self, q):
        self.sql_log.append(q)
        if q.startswith("MERGE INTO"):
            self._commit("merge")
            return _StubResult([])
        if ".history" in q:
            if not self.snaps:
                return _StubResult([])
            return _StubResult([{"snapshot_id": self.snaps[-1]["snapshot_id"]}])
        if ".snapshots" in q:
            return _StubResult(self.snaps)
        raise AssertionError(f"unexpected SQL: {q}")


class _StubWriterV2:
    def __init__(self, session, table):
        self.session, self.table = session, table

    def append(self):
        self.session._commit("append")

    def overwritePartitions(self):
        self.session._commit("overwrite")


class _StubDF:
    def __init__(self, session):
        self.sparkSession = session

    def writeTo(self, table):
        return _StubWriterV2(self.sparkSession, table)

    def createOrReplaceTempView(self, name):
        self.sparkSession.sql_log.append(f"CREATE_VIEW {name}")


def test_iceberg_backend_commit_roundtrip():
    s = _StubCatalogSession()
    t = SnapshotTable(path="/x", backend="iceberg",
                      iceberg_table="cat.db.docs", spark=s)
    assert t.current_snapshot_id() is None
    df = _StubDF(s)
    sid1 = t.commit_append(df)
    assert sid1 == 101
    sid2 = t.commit_overwrite(df)
    assert sid2 == 102
    assert [m["operation"] for m in t.snapshots()] == ["append", "overwrite"]
    assert t.snapshots()[-1]["parent_id"] == 101


def test_iceberg_backend_merge_into_passthrough():
    s = _StubCatalogSession()
    t = SnapshotTable(path="/x", backend="iceberg",
                      iceberg_table="cat.db.docs", spark=s)
    t.commit_append(_StubDF(s))
    sid = t.merge_upsert(s, _StubDF(s), key="doc_id")
    assert sid == 102
    merge = [q for q in s.sql_log if q.startswith("MERGE INTO")]
    assert len(merge) == 1
    assert "MERGE INTO cat.db.docs AS t" in merge[0]
    assert "ON t.doc_id = u.doc_id" in merge[0]
    assert "WHEN MATCHED THEN UPDATE SET *" in merge[0]
    assert "WHEN NOT MATCHED THEN INSERT *" in merge[0]
    # temp source view is created then dropped
    created = [q for q in s.sql_log if q.startswith("CREATE_VIEW")]
    dropped = [q for q in s.sql_log if q.startswith("DROP_VIEW")]
    assert len(created) == 1 and len(dropped) == 1
    assert created[0].split()[1] == dropped[0].split()[1]


def test_iceberg_backend_requires_session():
    t = SnapshotTable(path="/x", backend="iceberg", iceberg_table="c.d.t")
    with pytest.raises(ValueError, match="SparkSession"):
        t.current_snapshot_id()
