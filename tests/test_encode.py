"""Label-encode analogs (webx/encode.py): reference semantics of
str2idx + RecCTCLabelEncode / RecAttnLabelEncode
(rec_transforms.py:93-106, 171-181, 185-209) at word level."""

from __future__ import annotations

from webx.encode import attn_encode, ctc_encode

VOCAB = ["alpha", "beta", "gamma"]


def _rows(spark, fn, max_len=4):
    df = spark.createDataFrame(
        [
            ("ok", "alpha gamma"),
            ("oov_mixed", "alpha UNKNOWN beta"),  # OOV skipped, not error
            ("oov_only", "zzz qqq"),  # no valid token -> invalid
            ("too_long", "alpha beta alpha beta alpha"),  # n > max_len
            ("empty", ""),
        ],
        "k string, text string",
    )
    out = fn(df, "text", VOCAB, max_len=max_len)
    return {r["k"]: (r["length"], r["text_seq"]) for r in out.collect()}


def test_ctc_encode_reference_semantics(spark):
    got = _rows(spark, ctc_encode)
    blank = 3
    assert got["ok"] == (2, [0, 2, blank, blank])
    assert got["oov_mixed"] == (2, [0, 1, blank, blank])
    # invalid rows: all-blank, length 0 (reference returns None -> [])
    for k in ("oov_only", "too_long", "empty"):
        assert got[k] == (0, [blank] * 4), k


def test_attn_encode_reference_semantics(spark):
    got = _rows(spark, attn_encode)
    # GO=0, STOP=1, vocab ids shifted by 2; GO padding; width max_len+2
    assert got["ok"] == (2, [0, 2, 4, 1, 0, 0])
    assert got["oov_mixed"] == (2, [0, 2, 3, 1, 0, 0])
    for k in ("oov_only", "too_long", "empty"):
        assert got[k] == (0, [0, 1, 0, 0, 0, 0]), k


def test_lower_option(spark):
    df = spark.createDataFrame([("x", "ALPHA Beta")], "k string, text string")
    row = ctc_encode(df, "text", VOCAB, max_len=4, lower=True).first()
    assert (row["length"], row["text_seq"][:2]) == (2, [0, 1])
