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
