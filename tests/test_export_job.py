"""jobs/export.py — deterministic sharded training export with
shard-granular resume: an interrupted export resumed to completion is
row-identical (content AND within-shard order) to a one-shot export."""

from __future__ import annotations

import json
import os
import shutil
import sys

from pyspark.sql import functions as F

JOBS_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "jobs"
)
SYNTH = "/root/testdata/sf0.001"


def _run(argv):
    sys.path.insert(0, JOBS_DIR)
    import export as EJ

    return EJ.main(argv)


def _read_all(spark, out):
    return (
        spark.read.parquet(os.path.join(out, "data"))
        .orderBy("shard", "doc_id")
        .collect()
    )


def test_export_oneshot_complete_and_ordered(spark, tmp_path):
    out = str(tmp_path / "exp")
    assert _run(["--synth", SYNTH, "--output", out, "--n-shards", "8"]) == 0
    man = json.load(open(os.path.join(out, "_manifest.json")))
    assert len(man["shards"]) == 8
    got = spark.read.parquet(os.path.join(out, "data"))
    assert got.count() == 500 == sum(s["n_docs"] for s in man["shards"].values())
    # every row is in the shard its hash assigns, in unsigned-hash order
    from webx import xxh64 as X

    rows = got.select("shard", "doc_id").collect()
    for r in rows:
        assert X.to_unsigned(X.hash_long(r["doc_id"])) & 7 == r["shard"]
    # within-shard file order == unsigned-hash order (read preserves
    # parquet row order per file; one file per shard dir here)
    for s in range(8):
        ids = [
            r["doc_id"]
            for r in spark.read.parquet(
                os.path.join(out, "data", f"shard={s}")
            ).collect()
        ]
        assert ids == sorted(ids, key=lambda i: X.to_unsigned(X.hash_long(i)))


def test_export_resume_row_identical_to_oneshot(spark, tmp_path):
    ref, out = str(tmp_path / "ref"), str(tmp_path / "resume")
    assert _run(["--synth", SYNTH, "--output", ref, "--n-shards", "8"]) == 0
    # interrupted run: 3 shards, then a torn shard (written, no manifest)
    assert _run(
        ["--synth", SYNTH, "--output", out, "--n-shards", "8",
         "--max-shards-per-run", "3"]
    ) == 0
    man = json.load(open(os.path.join(out, "_manifest.json")))
    assert len(man["shards"]) == 3
    torn = json.loads(json.dumps(man))  # simulate kill after write of shard 3:
    # copy shard dir 3 from ref WITHOUT a manifest entry
    s3_src = os.path.join(ref, "data", "shard=3")
    s3_dst = os.path.join(out, "data", "shard=3")
    if not os.path.exists(s3_dst):
        shutil.copytree(s3_src, s3_dst)
    assert "3" not in torn["shards"]
    # resume to completion
    assert _run(["--synth", SYNTH, "--output", out, "--n-shards", "8"]) == 0
    man2 = json.load(open(os.path.join(out, "_manifest.json")))
    assert len(man2["shards"]) == 8
    assert man2["shards"] == json.load(
        open(os.path.join(ref, "_manifest.json"))
    )["shards"]
    assert [tuple(r) for r in _read_all(spark, out)] == [
        tuple(r) for r in _read_all(spark, ref)
    ]
    # idempotent once complete
    assert _run(["--synth", SYNTH, "--output", out, "--n-shards", "8"]) == 0
    assert [tuple(r) for r in _read_all(spark, out)] == [
        tuple(r) for r in _read_all(spark, ref)
    ]


def test_export_rejects_bad_shard_count(tmp_path):
    assert _run(
        ["--synth", SYNTH, "--output", str(tmp_path / "x"), "--n-shards", "10"]
    ) == 2
