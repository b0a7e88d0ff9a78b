"""Suffix array (webx/suffix.py) vs brute-force truth.

Load-bearing checks: (1) the distributed prefix-doubling order equals
Python's sorted() over the clipped suffixes (randomized, dense
alphabets, multibyte); (2) the two-phase range-partition dense rank
equals the window dense_rank; (3) the zip_with LCP equals a character
loop incl. the 2·cap−1 saturation; (4) adjacent_dup_pairs equals the
adjacency sweep over the sorted truth; (5) the base parameter (rank_0
prefix width) does not change the result."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from webx.suffix import (
    adjacent_dup_pairs,
    global_dense_rank,
    suffix_array,
    with_lcp,
)


def _corpus(seed, alpha, n_docs, max_len):
    rnd = random.Random(seed)
    docs = [(i, "".join(rnd.choice(alpha) for _ in range(rnd.randint(1, max_len))))
            for i in range(n_docs)]
    docs.append((n_docs, docs[0][1]))  # one exact duplicate document
    return docs


def _truth_sa(docs, max_chars):
    suf = []
    for d, t in docs:
        t = t[:max_chars]
        for p in range(1, len(t) + 1):
            suf.append((t[p - 1:], d, p))
    suf.sort()
    return suf


def _py_lcp(a, b, cap):
    lim = 2 * cap - 1
    a, b = a[:lim], b[:lim]
    n = min(len(a), len(b))
    i = 0
    while i < n and a[i] == b[i]:
        i += 1
    return i


@pytest.mark.parametrize("method", ["direct", "doubling"])
@pytest.mark.parametrize("alpha,seed", [("abn ", 5), ("aé日", 11), ("ab", 23)])
def test_suffix_array_matches_sorted_truth(spark, alpha, seed, method):
    docs = _corpus(seed, alpha, 24, 30)
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r.doc_id, r.pos): r.sa
        for r in suffix_array(df, max_chars=16, method=method).collect()
    }
    truth = {(d, p): i + 1 for i, (s, d, p) in enumerate(_truth_sa(docs, 16))}
    assert got == truth


def test_base_parameter_is_result_invariant(spark):
    docs = _corpus(7, "abn ", 20, 25)
    df = spark.createDataFrame(docs, "doc_id long, text string")
    ref = sorted(
        map(tuple, suffix_array(df, max_chars=16, base=1, method="doubling").collect())
    )
    for base in (4, 8, 16):
        got = suffix_array(df, max_chars=16, base=base, method="doubling").collect()
        assert sorted(map(tuple, got)) == ref


def test_direct_and_doubling_methods_agree(spark):
    """The one-ranked-pass fast path and the textbook prefix doubling
    must produce the identical suffix array (same ranks, same
    tie-breaks) — the differential that licenses defaulting to
    direct."""
    docs = _corpus(13, "abn x", 28, 40)
    df = spark.createDataFrame(docs, "doc_id long, text string")
    direct = sorted(map(tuple, suffix_array(df, max_chars=16, method="direct").collect()))
    doubling = sorted(
        map(tuple, suffix_array(df, max_chars=16, base=4, method="doubling").collect())
    )
    assert direct == doubling


def test_global_dense_rank_matches_window(spark):
    rnd = random.Random(3)
    rows = [(rnd.randint(0, 40), rnd.randint(0, 5)) for _ in range(3000)]
    df = spark.createDataFrame(rows, "a long, b long")
    got = {(r.a, r.b): r.r for r in global_dense_rank(df, ["a", "b"]).collect()}
    from pyspark.sql import Window

    want = {
        (r.a, r.b): r.r
        for r in df.distinct()
        .withColumn("r", F.dense_rank().over(Window.orderBy("a", "b")))
        .collect()
    }
    assert got == want


def test_with_lcp_matches_char_loop(spark):
    rnd = random.Random(9)
    pairs = [("", ""), ("", "x"), ("na", "na"), ("na", "nab"),
             ("banana split", "banana"), ("x" * 80, "x" * 80),
             ("x" * 80, "x" * 70 + "y" * 10)]
    pairs += [
        ("".join(rnd.choice("abé") for _ in range(rnd.randint(0, 70))),
         "".join(rnd.choice("abé") for _ in range(rnd.randint(0, 70))))
        for _ in range(300)
    ]
    df = spark.createDataFrame(pairs, "a string, b string")
    got = with_lcp(df, "a", "b", 32, "lcp").collect()
    for r in got:
        assert r.lcp == _py_lcp(r.a, r.b, 32), (r.a, r.b)
    # saturation: identical 80-char strings cap at 2*32-1 = 63
    sat = [r.lcp for r in got if r.a == "x" * 80 and r.b == "x" * 80]
    assert sat == [63]


def test_adjacent_dup_pairs_matches_truth(spark):
    docs = _corpus(5, "abn ", 24, 30)
    df = spark.createDataFrame(docs, "doc_id long, text string")
    MAX, CAP, MIN = 16, 8, 3
    suf = _truth_sa(docs, MAX)
    want = {}
    for i in range(len(suf) - 1):
        (s1, d1, _), (s2, d2, _) = suf[i], suf[i + 1]
        if d1 == d2:
            continue
        l = _py_lcp(s1, s2, CAP)
        if l >= MIN:
            k = (min(d1, d2), max(d1, d2))
            m, c = want.get(k, (0, 0))
            want[k] = (max(m, l), c + 1)
    got = {
        (r.id_a, r.id_b): (r.max_lcp, r.n_adj)
        for r in adjacent_dup_pairs(
            df, min_lcp=MIN, max_chars=MAX, lcp_cap=CAP
        ).collect()
    }
    assert got == want
    # the planted exact-duplicate doc must surface
    assert (0, 24) in got


def test_passage_decontamination_catches_planted_passage(spark):
    """A 30-char passage copied from a test doc into a train doc must
    surface as a cross-side pair regardless of where the 13-gram grid
    falls — the property the SA-based pass adds over q_decontaminate."""
    passage = "the exact benchmark answer text"
    rnd = random.Random(17)
    train = [(i, "".join(rnd.choice("xyzw ") for _ in range(40))) for i in range(1, 9)]
    train.append((9, "prefix words then " + passage + " and a tail"))
    test = [(1_000_000, passage + " padded out with more words")]
    df = spark.createDataFrame(train + test, "doc_id long, text string")
    got = adjacent_dup_pairs(df, min_lcp=len(passage), max_chars=64,
                             lcp_cap=32, base=16)
    rows = [
        r for r in got.collect()
        if r.id_a < 1_000_000 <= r.id_b
    ]
    assert rows and rows[0].id_a == 9 and rows[0].max_lcp >= len(passage)


def test_dup_profile_matches_truth(spark):
    """n_dup counts positions whose longest match ELSEWHERE (any other
    (doc,pos), same doc included) is >= min_lcp — computed brute-force
    as max LCP against every other suffix, vs the SA-neighbor identity
    max(lcp(prev), lcp(next))."""
    from webx.suffix import dup_profile

    docs = _corpus(13, "abn ", 18, 26)
    MAX, CAP, MIN = 16, 8, 4
    want = {}
    suf = _truth_sa(docs, MAX)
    strs = [s for s, _, _ in suf]
    for i, (s, d, p) in enumerate(suf):
        best = 0
        for j, s2 in enumerate(strs):
            if j != i:
                best = max(best, _py_lcp(s, s2, CAP))
        n_pos, n_dup = want.get(d, (0, 0))
        want[d] = (n_pos + 1, n_dup + (best >= MIN))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_pos, r.n_dup)
        for r in dup_profile(df, min_lcp=MIN, max_chars=MAX, lcp_cap=CAP).collect()
    }
    assert got == want
