"""RAKE keyword extraction (webx/textstats.py rake_keywords)."""

from __future__ import annotations

from webx.textstats import STOPWORDS, rake_keywords


def _ref_rake(text, stopwords, k=5):
    toks = [w for w in text.split() if w]
    phrases, cur = [], []
    for w in toks:
        if w in stopwords:
            if cur:
                phrases.append(cur)
            cur = []
        else:
            cur.append(w)
    if cur:
        phrases.append(cur)
    deg, freq = {}, {}
    for p in phrases:
        for w in p:
            deg[w] = deg.get(w, 0) + len(p)
            freq[w] = freq.get(w, 0) + 1
    scored = []
    for p in phrases:
        s = 0.0
        for w in p:
            s += deg[w] / freq[w]
        scored.append((" ".join(p), s))
    scored.sort(key=lambda t: (-t[1], t[0]))
    return scored[:k]


def test_matches_reference_per_doc(spark):
    texts = [
        "deep learning of deep neural networks and the gradient descent method",
        "fast key order and the fast key scan in a table scan",
        "one",
        "the a an and of",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = rake_keywords(df, k=5).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append((r.rank, r.phrase, r.score))
    for i, t in enumerate(texts):
        want = _ref_rake(t, set(STOPWORDS), k=5)
        got = sorted(by_doc.get(i, []))
        assert len(got) == len(want), i
        for (rank, phrase, score), (wp, ws) in zip(got, want):
            assert phrase == wp and abs(score - ws) < 1e-12, (i, rank)


def test_multiword_phrases_outrank_single_words(spark):
    df = spark.createDataFrame(
        [(0, "gradient descent method of learning in networks")],
        "doc_id long, text string",
    )
    rows = sorted(rake_keywords(df, k=5).collect(), key=lambda r: r.rank)
    assert rows[0].phrase == "gradient descent method"
    assert rows[0].score == 9.0  # 3 words, each deg 3 freq 1


def test_all_stopword_doc_yields_nothing(spark):
    df = spark.createDataFrame([(0, "the a an and of in")], "doc_id long, text string")
    assert rake_keywords(df).count() == 0
