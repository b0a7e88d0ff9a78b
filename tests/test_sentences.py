"""Sentence segmentation, readability, soft-404 (webx/textstats.py)."""

from __future__ import annotations

import math

from webx.textstats import readability, soft404_flags, split_sentences


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_split_sentences_order_and_runs(spark):
    df = _docs(spark, [(1, "One two. Three!  Four?! Five no terminal")])
    rows = split_sentences(df).orderBy("sent_idx").collect()
    assert [(r["sent_idx"], r["sentence"]) for r in rows] == [
        (0, "One two."),
        (1, "Three!"),
        (2, "Four?!"),
        (3, "Five no terminal"),
    ]


def test_split_sentences_no_boundary_and_internal_dots(spark):
    df = _docs(spark, [(1, "no punctuation at all"), (2, "v1.2.3 stays whole.")])
    out = {
        (r["doc_id"], r["sent_idx"]): r["sentence"]
        for r in split_sentences(df).collect()
    }
    assert out == {(1, 0): "no punctuation at all", (2, 0): "v1.2.3 stays whole."}


def test_readability_counters_and_grade(spark):
    df = _docs(spark, [(1, "The cat sat. The dog ran!"), (2, "")])
    rows = {r["doc_id"]: r for r in readability(df).collect()}
    r = rows[1]
    assert (r["n_words"], r["n_sentences"], r["n_syllables"]) == (6, 2, 6)
    expected = 206.835 - 1.015 * (6 / 2) - 84.6 * (6 / 6)
    assert r["fk_ease_x100"] == math.floor(expected * 100)
    # empty doc: zero words, grade undefined -> NULL
    assert rows[2]["n_words"] == 0 and rows[2]["fk_ease_x100"] is None


def test_soft404_requires_phrase_and_short_page(spark):
    long_tail = " filler" * 60
    df = _docs(
        spark,
        [
            (1, "Error 404 Page Not Found."),
            (2, "page not found" + long_tail),  # phrase but long page
            (3, "a perfectly fine article"),
        ],
    )
    rows = {r["doc_id"]: r for r in soft404_flags(df).collect()}
    assert (rows[1]["err_phrase"], rows[1]["soft404"]) == (1, 1)
    assert (rows[2]["err_phrase"], rows[2]["soft404"]) == (1, 0)
    assert (rows[3]["err_phrase"], rows[3]["soft404"]) == (0, 0)
