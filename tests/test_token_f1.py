"""token_f1 — hand-computed multiset overlaps."""

from __future__ import annotations

import pytest

from webx.metrics import token_f1


def test_hand_computed(spark):
    pred = spark.createDataFrame(
        [
            ("u1", "the cat sat the"),
            ("u2", "completely different words"),
            ("u3", ""),
            ("u4", "only in pred"),
        ],
        "url string, text string",
    )
    gold = spark.createDataFrame(
        [
            ("u1", "the cat ran"),      # overlap: the(1),cat(1) = 2
            ("u2", "nothing shared"),
            ("u3", ""),                 # both empty -> f1 = 1
            ("u4", ""),                 # pred-only tokens -> f1 = 0
        ],
        "url string, text string",
    )
    got = {r.url: r for r in token_f1(pred, gold).collect()}
    assert (got["u1"].n_pred, got["u1"].n_gold, got["u1"].n_overlap) == (4, 3, 2)
    assert got["u1"].f1 == pytest.approx(2 * 2 / 7)
    assert got["u2"].n_overlap == 0 and got["u2"].f1 == 0.0
    assert got["u3"].f1 == 1.0
    assert got["u4"].f1 == 0.0


def test_identical_text_is_one(spark):
    df = spark.createDataFrame(
        [("u", "a b c a"), ("v", "x y")], "url string, text string"
    )
    got = [r.f1 for r in token_f1(df, df).collect()]
    assert got == [1.0, 1.0]


def test_duplicate_tokens_counted_as_multiset(spark):
    pred = spark.createDataFrame([("u", "a a a")], "url string, text string")
    gold = spark.createDataFrame([("u", "a")], "url string, text string")
    (r,) = token_f1(pred, gold).collect()
    assert (r.n_pred, r.n_gold, r.n_overlap) == (3, 1, 1)
    assert r.f1 == pytest.approx(0.5)
