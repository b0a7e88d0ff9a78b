"""chunk_windows unit tests — hand-computed window grids."""

from __future__ import annotations

import pytest

from webx.curate import chunk_windows


def rows(spark, text, window, stride):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return sorted(
        (r.chunk_idx, r.n_chunk_tokens, r.chunk)
        for r in chunk_windows(df, window, stride).collect()
    )


def test_exact_grid(spark):
    text = " ".join(f"t{i}" for i in range(10))
    # window 4, stride 3 over 10 tokens: starts 0,3,6 -> wait
    # ceil((10-4)/3)=2 -> starts 0,3,6; chunks [0:4],[3:7],[6:10]
    got = rows(spark, text, 4, 3)
    assert got == [
        (0, 4, "t0 t1 t2 t3"),
        (1, 4, "t3 t4 t5 t6"),
        (2, 4, "t6 t7 t8 t9"),
    ]


def test_short_tail_chunk(spark):
    text = " ".join(f"t{i}" for i in range(11))
    # 11 tokens, window 4 stride 3: ceil(7/3)=3 -> starts 0,3,6,9; last len 2
    got = rows(spark, text, 4, 3)
    assert [g[0] for g in got] == [0, 1, 2, 3]
    assert got[-1] == (3, 2, "t9 t10")


def test_doc_shorter_than_window(spark):
    got = rows(spark, "a b c", 10, 5)
    assert got == [(0, 3, "a b c")]


def test_empty_doc_yields_no_chunks(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, None), (3, "   ")], "doc_id long, text string"
    )
    assert chunk_windows(df).count() == 0


def test_every_token_covered(spark):
    text = " ".join(f"t{i}" for i in range(257))
    got = rows(spark, text, 64, 48)
    seen = set()
    for _, _, chunk in got:
        seen.update(chunk.split(" "))
    assert seen == {f"t{i}" for i in range(257)}


def test_invalid_params(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_windows(df, window=0)
    with pytest.raises(ValueError):
        chunk_windows(df, stride=0)
