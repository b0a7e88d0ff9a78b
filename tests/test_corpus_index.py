"""collocations (PMI lift) + inverted_index unit tests — hand-computed
micro-goldens in the reference's rec_transforms.py:386-446 style."""

from __future__ import annotations

import pytest

from webx.textstats import collocations, inverted_index


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        [
            (0, "The cat sat on the mat"),
            (1, "the cat ran"),
            (2, ""),
            (3, None),
        ],
        "doc_id long, text string",
    )


def test_collocations_hand_computed(docs):
    # unigrams: the:3 cat:2 sat/on/mat/ran:1  N=9
    # pairs: (the,cat):2 is the only one with count >= 2
    rows = collocations(docs, min_count=2).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.w1, r.w2, r.c_pair, r.c1, r.c2) == ("the", "cat", 2, 3, 2)
    assert r.lift == pytest.approx(2 * 9 / (3 * 2))


def test_collocations_min_count_one_counts_every_pair(docs):
    rows = {(r.w1, r.w2): r.c_pair for r in collocations(docs, min_count=1).collect()}
    assert rows == {
        ("the", "cat"): 2,
        ("cat", "sat"): 1,
        ("sat", "on"): 1,
        ("on", "the"): 1,
        ("the", "mat"): 1,
        ("cat", "ran"): 1,
    }
    # single-token and empty/None docs contribute no pairs
    assert sum(rows.values()) == 7


def test_collocations_partition_independent(docs):
    a = sorted(map(tuple, collocations(docs, 1).collect()))
    b = sorted(map(tuple, collocations(docs.repartition(7), 1).collect()))
    assert a == b


def test_inverted_index_df_and_postings(docs):
    rows = {r.term: (r.df, r.postings) for r in inverted_index(docs, min_df=2).collect()}
    assert rows == {"the": (2, "0,1"), "cat": (2, "0,1")}


def test_inverted_index_postings_cap_keeps_df_exact(spark):
    docs = spark.createDataFrame(
        [(i, "common word") for i in range(10)], "doc_id long, text string"
    )
    rows = {r.term: r for r in inverted_index(docs, min_df=1, max_postings=3).collect()}
    for term in ("common", "word"):
        assert rows[term].df == 10  # exact despite the cap
        assert rows[term].postings == "0,1,2"  # ascending prefix


def test_inverted_index_duplicate_tokens_count_once_per_doc(spark):
    docs = spark.createDataFrame(
        [(5, "echo echo echo")], "doc_id long, text string"
    )
    rows = inverted_index(docs, min_df=1).collect()
    assert [(r.term, r.df, r.postings) for r in rows] == [("echo", 1, "5")]
