"""Multi-pattern matcher (webx/match.py): Aho-Corasick vs regex-
lookahead vs brute force — identical presence semantics, overlaps
included."""

from __future__ import annotations

import random

from webx.match import AhoCorasick, multi_term_match


def test_automaton_matches_brute_force_on_random_corpora():
    rnd = random.Random(42)
    alphabet = "abcd"
    terms = sorted(
        {"".join(rnd.choice(alphabet) for _ in range(rnd.randint(1, 4)))
         for _ in range(25)}
    )
    ac = AhoCorasick(terms)
    for _ in range(300):
        text = "".join(rnd.choice(alphabet) for _ in range(rnd.randint(0, 60)))
        want = {t for t in terms if t in text}
        assert ac.find_set(text) == want, (text, terms)


def test_overlapping_terms_all_found():
    ac = AhoCorasick(["abc", "bcd", "cde", "abcde"])
    assert ac.find_set("abcde") == {"abc", "bcd", "cde", "abcde"}


def test_spark_impls_agree_and_match_planted(spark):
    rows = [
        (1, "the Quick brown foX"),
        (2, "abcd overlapping zone"),
        (3, "nothing here"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    terms = ("quick", "fox", "abc", "bcd", "zone")
    a = {r["doc_id"]: (r["matched_terms"], r["n_matched"])
         for r in multi_term_match(df, terms, impl="regex").collect()}
    b = {r["doc_id"]: (r["matched_terms"], r["n_matched"])
         for r in multi_term_match(df, terms, impl="aho").collect()}
    assert a == b
    assert a[1] == (["fox", "quick"], 2)
    assert a[2] == (["abc", "bcd", "zone"], 3)   # overlap: abc AND bcd
    assert a[3] == ([], 0) and a[4] == ([], 0)


def test_large_dictionary_aho_scales(spark):
    """10^4 terms: the automaton builds and scans; (regex would too but
    compile cost climbs — this is the scale path's smoke test)."""
    terms = tuple(f"term{i:05d}" for i in range(10_000))
    df = spark.createDataFrame(
        [(1, "prefix term04217 suffix"), (2, "no dictionary words")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["matched_terms"]
           for r in multi_term_match(df, terms, impl="aho").collect()}
    assert got == {1: ["term04217"], 2: []}
