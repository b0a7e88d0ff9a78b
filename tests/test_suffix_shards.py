"""Cross-shard suffix-array orchestration (jobs/suffix_shards.py): on a
fixture whose duplicate clusters co-locate under the route key, the
merged N-shard answer must EQUAL the single-shard answer — for the pair
set and the per-document duplication profile — at N ∈ {1, 2, 4}."""

from __future__ import annotations

import json
import os

import pytest

from jobs.suffix_shards import main as job_main, run_sharded

# Splittable fixture: 6 groups; within each group two documents share a
# long passage (>= min_lcp chars) wrapped in distinct filler, plus one
# unrelated singleton. Groups share no >= min_lcp substring with each
# other (distinct vocabulary per group), so any shard assignment that
# keeps groups whole yields the global answer.
_GROUP_WORDS = [
    ("alpha", "ampere", "anchor"),
    ("bravo", "boron", "bridge"),
    ("cedar", "cobalt", "copper"),
    ("delta", "dynamo", "docket"),
    ("ember", "echoes", "envoy"),
    ("fjord", "fulcrum", "fathom"),
]


def _fixture_rows():
    # every token is derived from the group's own words, so no two
    # groups share ANY >= min_lcp-char substring — only within-group
    # duplicate passages exist
    rows = []
    did = 0
    for g, (w1, w2, w3) in enumerate(_GROUP_WORDS):
        shared = f"{w1} {w2} {w3} {w1}{w2}{w3} {w3}{w2} {w2}{w1}"
        rows.append((did, f"{w1}{w1} {shared}", g)); did += 1
        rows.append((did, f"{shared} {w2}{w2}", g)); did += 1
        rows.append((did, f"{w3}q{w3} {w3}z{w1}q {w2}x{w3}", g)); did += 1
    return rows


@pytest.fixture(scope="module")
def fixture_docs(spark):
    return spark.createDataFrame(
        _fixture_rows(), "doc_id long, text string, grp long"
    ).cache()


def _canon_pairs(df):
    return sorted(
        (r["id_a"], r["id_b"], r["max_lcp"], r["n_adj"]) for r in df.collect()
    )


def _canon_prof(df):
    return sorted((r["doc_id"], r["n_pos"], r["n_dup"]) for r in df.collect())


def test_sharded_equals_single_shard(fixture_docs):
    base_pairs, base_prof = run_sharded(
        fixture_docs, 1, min_lcp=20, shard_col="grp"
    )
    base_p, base_f = _canon_pairs(base_pairs), _canon_prof(base_prof)
    assert base_p, "fixture must contain duplicate pairs"
    assert len(base_p) == len(_GROUP_WORDS)  # one dup pair per group
    for n in (2, 4):
        pairs, prof = run_sharded(fixture_docs, n, min_lcp=20, shard_col="grp")
        assert _canon_pairs(pairs) == base_p
        assert _canon_prof(prof) == base_f


def test_default_content_hash_key_colocates_exact_duplicates(spark):
    # exact-copy documents share the text hash, so the DEFAULT route key
    # finds them at any shard count
    rows = [
        (0, "an exact duplicate document body repeated verbatim here"),
        (1, "an exact duplicate document body repeated verbatim here"),
        (2, "a completely different singleton with its own vocabulary"),
        (3, "yet another unrelated text with different words entirely"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    for n in (1, 3):
        pairs, _ = run_sharded(docs, n, min_lcp=20, with_profile=False)
        assert _canon_pairs(pairs)[0][:2] == (0, 1)
        assert len(_canon_pairs(pairs)) == 1


def test_job_cli_writes_outputs_and_summary(spark, tmp_path, monkeypatch):
    src = str(tmp_path / "docs")
    spark.createDataFrame(
        _fixture_rows(), "doc_id long, text string, grp long"
    ).write.parquet(src)
    out = str(tmp_path / "out")
    rc = job_main([
        "--input", src, "--output", out, "--shards", "2",
        "--shard-col", "grp", "--min-lcp", "20",
    ])
    assert rc == 0
    with open(os.path.join(out, "summary.json")) as f:
        summary = json.load(f)
    assert summary["shards"] == 2
    assert summary["n_pairs"] == len(_GROUP_WORDS)
    assert summary["n_profile_rows"] == len(_fixture_rows())
    assert spark.read.parquet(f"{out}/pairs").count() == summary["n_pairs"]
