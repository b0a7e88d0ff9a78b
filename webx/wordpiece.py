"""WordPiece tokenization (BERT's greedy longest-match-first subword).

The second major subword family next to BPE (webx/bpe.py): instead of
replaying learned merges, encoding walks each word left to right and
greedily takes the LONGEST vocabulary piece at every step —
continuation pieces carry the ``##`` prefix, and a word that cannot be
fully covered collapses to a single ``[UNK]`` (BERT semantics: no
partial emission). Greedy is deliberately not optimal — for vocab
{ab, abc, ##c, ##cd, ##d} the word "abcd" tokenizes as abc + ##d even
though ab + ##cd also covers it; the tests pin this down because it is
the part implementations get wrong.

Scale shape — the part that matters at 10^12 documents: tokenization
is a pure function of the WORD, and distinct words grow ~O(corpus^0.5)
(Heaps' law), so the corpus is never tokenized row by row. The plan is
    split+posexplode (codegen) → DISTINCT words (one agg on a
    few-million-row set) → greedy walk over the distinct words only
    (Arrow batch; microscopic next to the corpus) → broadcast join back.
The same distinct-then-broadcast trick the reference applies when it
caches per-character dictionary lookups once instead of per-crop
(mindocr/data/transforms/rec_transforms.py char-dict indexing).

The vocabulary is a deterministic literal (the LSH-hyperplane
convention), so the DuckDB oracle replays the greedy walk gram for
gram with an unrolled step chain.
"""

from __future__ import annotations

from typing import Iterable, Iterator

from pyspark.sql import DataFrame, functions as F

from webx.textstats import WS_SPLIT

UNK = "[UNK]"

# Deterministic demo vocabulary: every lowercase letter EXCEPT q as a
# word-initial piece (words with q collapse to [UNK] — the UNK path
# stays exercised), every letter as a continuation, plus multi-char
# pieces that make greedy-vs-optimal choices observable on the corpus.
VOCAB = (
    [UNK]
    + [c for c in "abcdefghijklmnoprstuvwxyz"]  # no 'q'
    + ["##" + c for c in "abcdefghijklmnopqrstuvwxyz"]
    + [
        "th", "the", "ta", "tab", "table", "##able", "##le", "##ble",
        "sc", "scan", "##an", "##can", "jo", "join", "##in", "##oin",
        "cust", "##omer", "##tom", "wind", "##ow", "##dow", "##ndow",
        "gr", "group", "##oup", "##roup", "st", "str", "stream", "##eam",
        "fil", "##ter", "##lter", "or", "ord", "##der", "##er",
        "da", "data", "##ata", "ro", "row", "me", "merge", "##rge",
    ]
)


def wordpiece_word(word: str, vocab: set) -> list:
    """BERT greedy longest-match-first for one word."""
    pieces, start, n = [], 0, len(word)
    while start < n:
        end = n
        cur = None
        while end > start:
            piece = word[start:end]
            if start > 0:
                piece = "##" + piece
            if piece in vocab:
                cur = piece
                break
            end -= 1
        if cur is None:
            return [UNK]
        pieces.append(cur)
        start = end
    return pieces or [UNK]


def wordpiece_encode(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab: list = None,
) -> DataFrame:
    """(doc_id, word_idx, piece_idx, piece, piece_id) — every word of
    every document tokenized; piece_id is the vocabulary index.
    """
    vocab = list(VOCAB if vocab is None else vocab)
    if len(set(vocab)) != len(vocab):
        # piece ids are vocabulary POSITIONS on both engines (dict here,
        # list_position in the oracle) — duplicates would desync them
        raise ValueError("vocabulary entries must be unique")
    vset = set(vocab)
    vindex = {p: i for i, p in enumerate(vocab)}

    words = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(
            F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), WS_SPLIT)
        ).alias("word_idx", "word"),
    ).filter(F.col("word") != "")
    distinct_words = words.select("word").distinct()

    def tok(batches: Iterable) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out_w, out_i, out_p, out_id = [], [], [], []
            for w in pdf["word"].values:
                for i, p in enumerate(wordpiece_word(w, vset)):
                    out_w.append(w)
                    out_i.append(i)
                    out_p.append(p)
                    out_id.append(vindex[p])
            yield pd.DataFrame(
                {
                    "word": pd.Series(out_w, dtype="object"),
                    "piece_idx": pd.Series(out_i, dtype="int32"),
                    "piece": pd.Series(out_p, dtype="object"),
                    "piece_id": pd.Series(out_id, dtype="int32"),
                }
            )

    pieced = distinct_words.mapInPandas(
        tok, schema="word string, piece_idx int, piece string, piece_id int"
    )
    return words.join(F.broadcast(pieced), "word").select(
        "doc_id", "word_idx", "piece_idx", "piece", "piece_id"
    )
