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


def test_compiled_ac_identical_to_python():
    """C automaton walk (webx/_ctok.c wx_ac_find) == the Python
    reference on overlapping, unicode, and shared-prefix dictionaries —
    including a pickle round trip (the instance ships to executors)."""
    import pickle
    import random

    import pytest as _pytest

    from webx.ctokenize import AVAILABLE
    from webx.match import AhoCorasick, CompiledAC

    if not AVAILABLE:
        _pytest.skip("C kernel not built")
    random.seed(3)
    terms = sorted(
        {"abc", "bcd", "ab", "bc", "c", "café", "é b", "漢字", "he", "she",
         "hers", "his", "aaaa", "aa"}
        | {"".join(random.choice("abcdé漢 ") for _ in range(random.randint(1, 7)))
           for _ in range(200)}
    )
    py, c = AhoCorasick(terms), CompiledAC(terms)
    c2 = pickle.loads(pickle.dumps(c))
    texts = ["", "abcd", "ushers", "caféé b漢字と", "aaaaaa", "x" * 100] + [
        "".join(random.choice("abcdé漢 hers") for _ in range(random.randint(0, 300)))
        for _ in range(500)
    ]
    for t in texts:
        want = py.find_set(t)
        assert c.find_set(t) == want
        assert c2.find_set(t) == want


def test_compiled_ac_python_walk_fallback(monkeypatch):
    """An executor process without the built C kernel must degrade to
    the pure-Python walk over the same shipped arrays, not fail the job
    (driver-side construction succeeding proves nothing about every
    executor). The fallback walk must agree with the reference."""
    import pickle
    import random

    import pytest as _pytest

    from webx import ctokenize as ck
    from webx.match import AhoCorasick, CompiledAC

    if not ck.AVAILABLE:
        _pytest.skip("C kernel not built")
    terms = ["abc", "bcd", "ab", "bc", "c", "he", "she", "hers", "漢字"]
    py = AhoCorasick(terms)
    c = pickle.loads(pickle.dumps(CompiledAC(terms)))  # fresh, unbound
    monkeypatch.setattr(ck, "AVAILABLE", False)  # simulate no-kernel exec
    random.seed(7)
    texts = ["", "abcd", "ushers", "x漢字y", "abcbcd"] + [
        "".join(random.choice("abcdhers漢字 ") for _ in range(random.randint(0, 80)))
        for _ in range(200)
    ]
    for t in texts:
        assert c.find_set(t) == py.find_set(t)
    assert c._args == ()  # took (and stayed on) the Python path


def test_multi_term_match_aho_uses_compiled(spark):
    """impl='aho' end-to-end with the C walk active: same frame as
    impl='regex' on an overlap corpus."""
    from webx.match import multi_term_match

    docs = spark.createDataFrame(
        [(1, "xxabcdyy"), (2, "no hits here"), (3, "ushers and Hers")],
        "id int, text string",
    )
    terms = ("abc", "bcd", "he", "she", "hers")
    a = multi_term_match(docs, terms, impl="aho").orderBy("id").collect()
    r = multi_term_match(docs, terms, impl="regex").orderBy("id").collect()
    assert [x.asDict() for x in a] == [x.asDict() for x in r]
