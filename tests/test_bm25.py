"""BM25 retrieval (webx/textstats.py bm25_topk): exact-score parity
with a row-by-row Python reference (the float anchor the driver gate
deliberately omits — it gates only the integer columns), plus ranking
determinism and plan-shape sanity."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from webx.textstats import bm25_topk

K1, B = 1.2, 0.75


def _py_bm25(texts: dict, query: list, k1=K1, b=B):
    """Independent reference: dict doc_id -> text."""
    toks = {d: t.split() for d, t in texts.items()}
    n = len(texts)
    avgdl = sum(len(v) for v in toks.values()) / n
    df = {}
    for q in query:
        df[q] = sum(1 for v in toks.values() if q in [w.lower() for w in v])
    out = {}
    for d, v in toks.items():
        low = [w.lower() for w in v]
        dl = len(low)
        score = 0.0
        hits = 0
        tf_sum = 0
        for q in query:  # FIXED query order, like the Spark side
            tf = low.count(q)
            if not tf:
                continue
            hits += 1
            tf_sum += tf
            idf = math.log(1.0 + (n - df[q] + 0.5) / (df[q] + 0.5))
            score += idf * (tf * (k1 + 1.0)) / (
                tf + k1 * ((1.0 - b) + b * dl / avgdl)
            )
        if hits:
            out[d] = (hits, tf_sum, dl, score)
    return out


CORPUS = {
    0: "spark spark spark window merge",
    1: "merge window",
    2: "spark",
    3: "nothing relevant here at all",
    4: "window window window window window window window window",
    5: "spark merge window spark merge window",
    6: "SPARK Merge WINDOW",  # case folding
}
QUERY = ["spark", "merge", "window"]


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [(d, t) for d, t in CORPUS.items()], ["doc_id", "text"]
    )


def test_bm25_scores_match_python_reference(corpus):
    got = bm25_topk(corpus, QUERY, k=10).collect()
    want = _py_bm25(CORPUS, QUERY)
    # docs with zero hits are absent
    assert {r["doc_id"] for r in got} == set(want)
    for r in got:
        hits, tf_sum, dl, score = want[r["doc_id"]]
        assert (r["n_hit"], r["tf_sum"], r["dl"]) == (hits, tf_sum, dl)
        assert r["score"] == pytest.approx(score, abs=1e-12)
    # ranking: score desc then doc_id asc, ranks dense from 1
    order = sorted(want.items(), key=lambda kv: (-kv[1][3], kv[0]))
    assert [r["doc_id"] for r in sorted(got, key=lambda r: r["rank"])] == [
        d for d, _ in order
    ]
    assert sorted(r["rank"] for r in got) == list(range(1, len(want) + 1))


def test_bm25_k_truncates_and_is_partition_independent(spark):
    docs = spark.range(300).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("filler "),
            F.when(F.col("id") % 3 == 0, "spark spark").otherwise("x"),
            F.lit(" "),
            F.when(F.col("id") % 5 == 0, "merge").otherwise("y"),
        ).alias("text"),
    )
    a = [tuple(r) for r in bm25_topk(docs.coalesce(1), QUERY, k=7).collect()]
    b = [tuple(r) for r in bm25_topk(docs.repartition(16), QUERY, k=7).collect()]
    assert a == b
    assert len(a) == 7


def test_bm25_no_query_terms_in_corpus(spark):
    docs = spark.createDataFrame([(0, "aa bb"), (1, "cc")], ["doc_id", "text"])
    assert bm25_topk(docs, ["zz"], k=5).count() == 0
