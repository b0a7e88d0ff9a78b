"""Prefix-filtered exact set-similarity join (webx/dedup.py
jaccard_join) vs brute-force truth — the completeness theorem tested on
adversarial corpora (tiny vocab → dense overlap structure)."""

from __future__ import annotations

import random

from webx.dedup import jaccard_join


def _shingles(text, k=3):
    toks = text.split()
    if len(toks) < k:
        return frozenset([" ".join(toks)])
    return frozenset(" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1))


def _truth(texts, t, k=3):
    out = set()
    sh = {i: _shingles(s, k) for i, s in enumerate(texts)}
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            inter = len(sh[i] & sh[j])
            union = len(sh[i] | sh[j])
            if union and inter / union >= t:
                out.add((i, j))
    return out


def test_randomized_completeness(spark):
    rng = random.Random(31)
    vocab = ["aa", "bb", "cc", "dd", "ee"]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 12)))
        for _ in range(60)
    ]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(texts)], "doc_id long, text string"
    )
    for t in (0.3, 0.5, 0.8):
        got = {
            (r.id_a, r.id_b)
            for r in jaccard_join(df, threshold=t, shingle_k=3).collect()
        }
        assert got == _truth(texts, t), t


def test_planted_neardup_found(spark):
    base = "the quick brown fox jumps over the lazy dog again and again"
    df = spark.createDataFrame(
        [(0, base), (1, base.rsplit(" ", 1)[0]), (2, "completely different words here")],
        "doc_id long, text string",
    )
    got = {(r.id_a, r.id_b): r.jaccard for r in jaccard_join(df, threshold=0.5).collect()}
    assert (0, 1) in got and got[(0, 1)] >= 0.8
    assert not any(2 in p for p in got)


def test_jaccard_values_exact(spark):
    # identical docs: J = 1.0 exactly
    df = spark.createDataFrame(
        [(0, "a b c d e f"), (1, "a b c d e f")], "doc_id long, text string"
    )
    rows = jaccard_join(df, threshold=0.99).collect()
    assert len(rows) == 1 and rows[0].jaccard == 1.0
