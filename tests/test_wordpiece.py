"""WordPiece greedy semantics (webx/wordpiece.py)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from webx.wordpiece import UNK, VOCAB, wordpiece_encode, wordpiece_word


def test_vocab_unique():
    assert len(set(VOCAB)) == len(VOCAB)


def test_greedy_is_not_optimal():
    # the classic trap: greedy takes abc + ##d even though ab + ##cd
    # also covers; implementations that backtrack get this "better"
    # and therefore WRONG (BERT never backtracks)
    vocab = {"ab", "abc", "##c", "##cd", "##d"}
    assert wordpiece_word("abcd", vocab) == ["abc", "##d"]


def test_unk_collapses_whole_word():
    # 'xy' starts fine ('x' in vocab) but '##y' is missing: the WHOLE
    # word becomes [UNK], not ['x', UNK]
    vocab = {"x", "##z"}
    assert wordpiece_word("xz", vocab) == ["x", "##z"]
    assert wordpiece_word("xy", vocab) == [UNK]
    assert wordpiece_word("y", vocab) == [UNK]


def test_corpus_words():
    vset = set(VOCAB)
    assert wordpiece_word("table", vset) == ["table"]
    assert wordpiece_word("customer", vset) == ["cust", "##omer"]
    assert wordpiece_word("window", vset) == ["wind", "##ow"]
    assert wordpiece_word("query", vset) == [UNK]  # no 'q' initial


def test_reassembly_property():
    vset = set(VOCAB)
    rng = random.Random(21)
    for _ in range(300):
        w = "".join(rng.choice("abcdefghijklmnopqrstuvwxyz") for _ in range(rng.randint(1, 10)))
        pieces = wordpiece_word(w, vset)
        if pieces == [UNK]:
            continue
        assert pieces[0] + "".join(p[2:] for p in pieces[1:]) == w
        assert all(p.startswith("##") for p in pieces[1:])
        assert not pieces[0].startswith("##")


def test_encode_dataframe_positions(spark):
    df = spark.createDataFrame(
        [(0, "table query"), (1, "  customer  "), (2, "")],
        "doc_id long, text string",
    )
    rows = wordpiece_encode(df).collect()
    got = {(r.doc_id, r.word_idx, r.piece_idx): (r.piece, r.piece_id) for r in rows}
    assert got[(0, 0, 0)][0] == "table"
    assert got[(0, 1, 0)][0] == UNK
    assert got[(0, 1, 0)][1] == 0  # UNK is vocab position 0
    assert got[(1, 0, 0)][0] == "cust"
    assert got[(1, 0, 1)][0] == "##omer"
    assert not any(r.doc_id == 2 for r in rows)  # empty doc yields nothing
    # piece ids are vocabulary positions
    for (_, _, _), (piece, pid) in got.items():
        assert VOCAB[pid] == piece


def test_duplicate_vocab_rejected(spark):
    df = spark.createDataFrame([(0, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        wordpiece_encode(df, vocab=["a", "a"])
