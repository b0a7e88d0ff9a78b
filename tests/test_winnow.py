"""Winnowing fingerprints (webx/winnow.py) vs a brute-force Python
reference, the shared-passage guarantee, and partition independence."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from webx import xxh64 as X
from webx.winnow import winnow_fingerprints, winnow_matches


def _py_winnow(text: str, k: int, w: int, prefix: int = 256):
    s = re.sub(r"[^a-z0-9]", "", text.lower())[:prefix]
    if len(s) < w + k - 1:
        return set()
    hs = [
        (X.to_unsigned(X.hash_bytes(s[p : p + k].encode())), p + 1)
        for p in range(len(s) - k + 1)
    ]
    sel = set()
    for start in range(len(hs) - w + 1):
        win = hs[start : start + w]
        m = min((hu, -pos) for hu, pos in win)
        pos = -m[1]
        hu = m[0]
        sel.add((pos, hu - (1 << 64) if hu >= 1 << 63 else hu))
    return sel


def test_matches_python_reference(spark):
    texts = [
        (0, "The quick brown fox jumps over the lazy dog near the river bank."),
        (1, "Winnowing selects minima; winnowing selects minima; twice."),
        (2, "short"),
        (3, "abcdefghijk"),  # exactly enough for one window at k=8,w=4
    ]
    docs = spark.createDataFrame(texts, ["doc_id", "text"])
    got: dict = {}
    for r in winnow_fingerprints(docs, k=8, w=4).collect():
        got.setdefault(r["doc_id"], set()).add((r["pos"], r["h"]))
    for i, t in texts:
        want = _py_winnow(t, 8, 4)
        assert got.get(i, set()) == want, i


def test_shared_passage_guarantee_and_matches(spark):
    passage = "every shared substring of length w plus k minus one leaves a witness"
    docs = spark.createDataFrame(
        [
            (0, "Intro words here. " + passage + " And an ending."),
            (1, "Totally different opening, " + passage),
            (2, "No overlap with anything else at all, purely unique text."),
        ],
        ["doc_id", "text"],
    )
    pairs = {(r["id_a"], r["id_b"]): r["n_shared"]
             for r in winnow_matches(docs, min_shared=1).collect()}
    assert (0, 1) in pairs and pairs[(0, 1)] >= 3
    assert not any(2 in p for p in pairs)


def test_partition_independent(spark):
    docs = spark.range(300).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("document body number "),
            F.col("id").cast("string"),
            F.lit(" with some repeated template text for fingerprinting"),
        ).alias("text"),
    )
    a = sorted(map(tuple, winnow_fingerprints(docs.coalesce(1)).collect()))
    b = sorted(map(tuple, winnow_fingerprints(docs.repartition(16)).collect()))
    assert a == b
