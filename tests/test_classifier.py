"""Hashed n-gram linear classifier (webx/classifier.py)."""

from __future__ import annotations

import pytest

from webx.classifier import hashed_ngram_score

WEIGHTS = [((j * 37) % 21) - 10 for j in range(64)]


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_score_matches_python_reference(spark):
    import webx.xxh64 as X

    text = "the quick brown fox jumps over the lazy dog"
    toks = text.split()
    expected = -2
    for a, b in zip(toks, toks[1:]):
        h = X.hash_bytes(f"{a} {b}".encode())  # unsigned
        expected += WEIGHTS[h % 64]
    row = hashed_ngram_score(
        _docs(spark, [(1, text)]), WEIGHTS, bias=-2
    ).collect()[0]
    assert row["score"] == expected
    assert row["n_grams"] == len(toks) - 1
    assert row["keep"] == int(expected > 0)


def test_short_and_null_docs_score_bias(spark):
    rows = hashed_ngram_score(
        _docs(spark, [(1, "single"), (2, ""), (3, None)]), WEIGHTS, bias=5
    ).collect()
    for r in rows:
        assert (r["n_grams"], r["score"], r["keep"]) == (0, 5, 1)


def test_non_power_of_two_dim_rejected(spark):
    with pytest.raises(ValueError):
        hashed_ngram_score(_docs(spark, [(1, "a b")]), [1, 2, 3])
