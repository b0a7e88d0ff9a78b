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
