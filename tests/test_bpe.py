"""BPE training/encoding vs an independent pure-Python reference
implementation (classic Sennrich dict-based algorithm, written from the
paper, not from webx/bpe.py)."""

from __future__ import annotations

import re
from collections import Counter

import pytest

from webx.bpe import END, bpe_encode, initial_vocab, learn_bpe, pair_counts
from webx.textstats import BPE_SPLIT

_PRETOK = re.compile(BPE_SPLIT)


def ref_word_counts(texts):
    c = Counter()
    for t in texts:
        c.update(_PRETOK.findall(t or ""))
    return c


def ref_pair_counts(vocab):
    pc = Counter()
    for syms, n in vocab.values():
        for a, b in zip(syms, syms[1:]):
            pc[(a, b)] += n
    return pc


def ref_learn(texts, n_merges):
    vocab = {
        w: (tuple(w) + (END,), n) for w, n in ref_word_counts(texts).items()
    }
    merges = []
    for r in range(1, n_merges + 1):
        pc = ref_pair_counts(vocab)
        if not pc:
            break
        # count desc, then p1, p2 asc — the frozen tie-break
        (p1, p2), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((r, p1, p2, cnt))
        new = {}
        for w, (syms, n) in vocab.items():
            out = []
            for s in syms:
                if out and out[-1] == p1 and s == p2:
                    out[-1] = p1 + p2
                else:
                    out.append(s)
            new[w] = (tuple(out), n)
        vocab = new
    return merges, vocab


def ref_encode(text, vocab, merges):
    pieces = []
    for w in _PRETOK.findall(text or ""):
        if w in vocab:
            pieces.extend(vocab[w][0])
        else:
            syms = list(w) + [END]
            for _, p1, p2, _ in merges:
                out = []
                for s in syms:
                    if out and out[-1] == p1 and s == p2:
                        out[-1] = p1 + p2
                    else:
                        out.append(s)
                syms = out
            pieces.extend(syms)
    return pieces


TEXTS = [
    "low lower lowest low low",
    "new newer newest new",
    "the lowly newt, the low new low!",
    "",
    "widest wide wider new low",
]


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        list(enumerate(TEXTS)), "doc_id long, text string"
    )


def test_initial_pair_counts_match_reference(docs):
    got = {
        (r.p1, r.p2): r.cnt
        for r in pair_counts(initial_vocab(docs)).collect()
    }
    vocab = {
        w: (tuple(w) + (END,), n) for w, n in ref_word_counts(TEXTS).items()
    }
    assert got == dict(ref_pair_counts(vocab))


def test_learn_matches_reference_exactly(docs):
    merges, vocab = learn_bpe(docs, n_merges=10)
    ref_merges, ref_vocab = ref_learn(TEXTS, 10)
    assert merges == ref_merges
    got_vocab = {r.word: tuple(r.syms) for r in vocab.collect()}
    assert got_vocab == {w: syms for w, (syms, _) in ref_vocab.items()}


def test_learn_partition_independent(docs):
    a, _ = learn_bpe(docs, 6)
    b, _ = learn_bpe(docs.repartition(7), 6)
    assert a == b


def test_encode_in_vocab_and_oov(docs, spark):
    merges, vocab = learn_bpe(docs, 8)
    _, ref_vocab = ref_learn(TEXTS, 8)
    # 'slowest' is OOV ('slow' never appears as a word), empty text too
    new_docs = spark.createDataFrame(
        [(100, "low newest slowest"), (101, "")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in bpe_encode(new_docs, merges, vocab).collect()}
    for did, text in [(100, "low newest slowest"), (101, "")]:
        exp = ref_encode(text, ref_vocab, merges)
        assert rows[did].pieces == " ".join(exp)
        assert rows[did].n_pieces == len(exp)


def test_encode_without_vocab_table(docs, spark):
    """vocab=None forces the merge-replay path for every word — must
    agree with the join path."""
    merges, vocab = learn_bpe(docs, 8)
    a = {r.doc_id: r.pieces for r in bpe_encode(docs, merges, vocab).collect()}
    b = {r.doc_id: r.pieces for r in bpe_encode(docs, merges, None).collect()}
    assert a == b


def test_merge_greedy_left_to_right(spark):
    """'aaa' with merge (a,a) -> ['aa','a'] — non-overlapping greedy."""
    docs = spark.createDataFrame([(0, "aaa aaa")], "doc_id long, text string")
    merges, vocab = learn_bpe(docs, 1)
    assert [(m[1], m[2]) for m in merges] == [("a", "a")]
    (row,) = vocab.collect()
    assert row.syms == ["aa", "a", END]
