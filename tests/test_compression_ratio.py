"""compression_ratio — exact zlib anchoring + signal direction."""

from __future__ import annotations

import zlib

from webx.textstats import compression_ratio


def test_exact_zlib_byte_counts(spark):
    texts = ["spam spam spam spam spam spam", "a1B!x9 Qz@7 mK#p", ""]
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {r.doc_id: r for r in compression_ratio(df).collect()}
    for i, t in enumerate(texts):
        assert got[i].n_bytes == len(t.encode())
        assert got[i].n_compressed == len(zlib.compress(t.encode(), 6))
    assert got[2].ratio == 1.0  # empty doc sentinel


def test_redundant_text_scores_lower(spark):
    rep = "cookie banner accept all " * 40
    prose = (
        "The committee reviewed seventeen distinct proposals before "
        "narrowing the field; each author defended unusual choices "
        "regarding methodology, budget, and projected community impact."
    )
    df = spark.createDataFrame(
        [(0, rep), (1, prose)], "doc_id long, text string"
    )
    got = {r.doc_id: r.ratio for r in compression_ratio(df).collect()}
    assert got[0] < 0.2 < got[1]
