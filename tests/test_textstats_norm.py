"""normalize_punct + char_class_profile unit tests."""

from __future__ import annotations

from webx.textstats import char_class_profile, normalize_punct


def test_normalize_punct_rules(spark):
    df = spark.createDataFrame(
        [
            (0, "“Smart” — it’s… fine − ok now"),
            (1, "plain ascii stays"),
            (2, None),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in normalize_punct(df).collect()}
    assert got[0].text_norm == '"Smart" - it\'s... fine - ok now'
    assert got[0].punct_changed == 1
    assert got[1].text_norm == "plain ascii stays"
    assert got[1].punct_changed == 0
    assert got[2].text_norm is None  # null propagates, flag null too


def test_char_class_profile_counts(spark):
    df = spark.createDataFrame(
        [(0, "Ab1 ?é"), (1, ""), (2, None)], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in char_class_profile(df).collect()}
    r = got[0]
    # "Ab1 ?é": A upper, b lower, 1 digit, 1 space, '?' + 'é' other
    assert (r.n_chars, r.n_upper, r.n_lower, r.n_digit, r.n_space, r.n_other) == (
        6, 1, 1, 1, 1, 2
    )
    assert tuple(got[1])[1:] == (0, 0, 0, 0, 0, 0)
    assert tuple(got[2])[1:] == (0, 0, 0, 0, 0, 0)  # null -> zeros


def test_fold_homoglyphs_counts_and_folds(spark):
    from webx.textstats import fold_homoglyphs

    df = spark.createDataFrame(
        [(1, "Vіаgra"), (2, "plain latin"), (3, "Μοscоw")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in fold_homoglyphs(df).collect()}
    assert out[1]["text_folded"] == "Viagra" and out[1]["homoglyphs_folded"] == 2
    assert out[2]["text_folded"] == "plain latin" and out[2]["homoglyphs_folded"] == 0
    assert out[3]["text_folded"] == "Moscow" and out[3]["homoglyphs_folded"] == 3


def test_blocklist_gate_sees_through_obfuscation(spark):
    from webx.textstats import blocklist_gate

    df = spark.createDataFrame(
        [
            (1, "win at the c-a-s.i$n-o tonight"),
            (2, "Vіаgra deals"),          # Cyrillic і а
            (3, "viag ra split by space"),  # space is stripped too -> hits
            (4, "perfectly clean prose"),
            (5, "CASINO uppercase"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: (r["blocked_term"], r["keep"]) for r in
           blocklist_gate(df, ("viagra", "casino")).collect()}
    assert out[1] == ("casino", 0)
    assert out[2] == ("viagra", 0)
    assert out[3] == ("viagra", 0)
    assert out[4] == (None, 1)
    assert out[5] == ("casino", 0)


def test_blocklist_gate_first_term_priority(spark):
    from webx.textstats import blocklist_gate

    df = spark.createDataFrame([(1, "viagra casino")], "doc_id long, text string")
    row = blocklist_gate(df, ("viagra", "casino")).collect()[0]
    assert row["blocked_term"] == "viagra"
