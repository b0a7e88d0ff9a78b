"""Label encoding — the str2idx / RecCTCLabelEncode / RecAttnLabelEncode
recast (mindocr/data/transforms/rec_transforms.py:12-107,110-182,185-209),
word-level instead of char-level (the natural unit for webtext).

Reference semantics preserved exactly, per row:
* invalid when the sequence is empty, longer than ``max_len``, or no
  token is in the vocabulary → the reference returns None and encodes
  as an all-blank / unframed sequence with length 0;
* out-of-vocabulary tokens are SKIPPED (str2idx's `continue`);
* CTC frame: ids + blank-pad to ``max_len`` (blank = len(vocab), the
  reference's trailing blank index);
* attention frame: [GO] + (ids shifted past the specials) + [STOP] +
  GO-pad — width ``max_len + 2`` (rec_transforms.py:177).

All JVM expressions (map literal lookup + higher-order array functions);
no Python, no shuffle.
"""

from __future__ import annotations

from itertools import chain

from pyspark.sql import Column, DataFrame, functions as F

from webx.textstats import WS_SPLIT

GO_IDX = 0
STOP_IDX = 1


def _ids(col, vocab: list, lower: bool, offset: int = 0) -> Column:
    """Vocabulary lookup: tokens → 0-based vocab ids (+offset), OOV
    tokens skipped."""
    m = F.create_map(
        *chain.from_iterable(
            (F.lit(t), F.lit(i + offset)) for i, t in enumerate(vocab)
        )
    )
    toks = F.split(F.trim(col), WS_SPLIT)
    if lower:
        toks = F.transform(toks, F.lower)
    hits = F.filter(toks, lambda t: m[t].isNotNull())
    return F.transform(hits, lambda t: m[t])


def _n_toks(col) -> Column:
    return F.size(F.split(F.trim(col), WS_SPLIT))


def ctc_encode(
    df: DataFrame,
    col: str,
    vocab: list,
    max_len: int,
    lower: bool = False,
) -> DataFrame:
    """→ df + (length int, text_seq array<int>[max_len])."""
    blank = len(vocab)
    ids = _ids(F.col(col), vocab, lower)
    n = _n_toks(F.col(col))
    valid = (n > 0) & (n <= max_len) & (F.size(ids) > 0)
    pad = F.array_repeat(F.lit(blank), max_len - F.size(ids))
    seq = F.when(valid, F.concat(ids, pad)).otherwise(
        F.array_repeat(F.lit(blank), max_len)
    )
    length = F.when(valid, F.size(ids)).otherwise(F.lit(0))
    return df.withColumn("length", length.cast("int")).withColumn(
        "text_seq", seq.cast("array<int>")
    )


def attn_encode(
    df: DataFrame,
    col: str,
    vocab: list,
    max_len: int,
    lower: bool = False,
) -> DataFrame:
    """→ df + (length int, text_seq array<int>[max_len + 2]) with GO=0,
    STOP=1 framing; vocab ids start at 2."""
    ids = _ids(F.col(col), vocab, lower, offset=2)
    n = _n_toks(F.col(col))
    valid = (n > 0) & (n <= max_len) & (F.size(ids) > 0)
    ids_v = F.when(valid, ids).otherwise(F.array().cast("array<int>"))
    seq = F.concat(
        F.array(F.lit(GO_IDX)),
        ids_v,
        F.array(F.lit(STOP_IDX)),
        F.array_repeat(F.lit(GO_IDX), max_len - F.size(ids_v)),
    )
    length = F.when(valid, F.size(ids)).otherwise(F.lit(0))
    return df.withColumn("length", length.cast("int")).withColumn(
        "text_seq", seq.cast("array<int>")
    )
