"""Trained hashed-n-gram language ID (webx/langmodel.py): deterministic
training, held-out accuracy through the Spark scorer, and the shared
policy edges (tie priority, 'und' on empty)."""

from __future__ import annotations

import pyspark.sql.functions as F

from webx.langmodel import (
    DIM,
    FROZEN_WEIGHTS,
    LANGS,
    TEST_SNIPPETS,
    langid_model,
    train_langid,
)


def test_training_is_deterministic():
    again = train_langid()
    assert again == FROZEN_WEIGHTS
    for lang in LANGS:
        assert len(again[lang]) == DIM
        assert all(isinstance(v, int) for v in again[lang])
        assert all(v < 0 for v in again[lang])  # log-likelihoods


def test_heldout_snippets_classified_correctly(spark):
    rows = [(i, TEST_SNIPPETS[lang]) for i, lang in enumerate(LANGS)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["pred_lang"]
        for r in langid_model(docs).collect()
    }
    assert got == {i: lang for i, lang in enumerate(LANGS)}


def test_training_sentences_classified_correctly(spark):
    from webx.langmodel import LANG_CORPUS

    rows = []
    expect = {}
    i = 0
    for lang in LANGS:
        for sent in LANG_CORPUS[lang]:
            rows.append((i, sent))
            expect[i] = lang
            i += 1
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["pred_lang"] for r in langid_model(docs).collect()}
    assert got == expect  # 24/24 on the training set


def test_empty_text_is_und(spark):
    docs = spark.createDataFrame(
        [(0, ""), (1, None), (2, "   ")], "doc_id long, text string"
    )
    out = langid_model(docs).collect()
    assert all(r["pred_lang"] == "und" for r in out)
    assert all(r["s_en"] == 0 for r in out)


def test_scores_are_integers_and_comparable(spark):
    docs = spark.createDataFrame(
        [(0, TEST_SNIPPETS["de"])], "doc_id long, text string"
    )
    r = langid_model(docs).collect()[0]
    assert r["s_de"] == max(r["s_en"], r["s_de"], r["s_fr"], r["s_es"])
    schema = {f.name: f.dataType.simpleString() for f in langid_model(docs).schema}
    assert schema["s_en"] == "bigint" and schema["pred_lang"] == "string"


def test_plan_is_shuffle_free(spark):
    import contextlib
    import io

    docs = spark.createDataFrame(
        [(0, "ein test")], "doc_id long, text string"
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        langid_model(docs).explain("formatted")
    assert "Exchange" not in buf.getvalue()
    assert "BatchEvalPython" not in buf.getvalue()
