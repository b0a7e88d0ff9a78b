"""Bit-identity of webx.xxh64 (pure Python + numpy) vs Spark's xxhash64,
and equality of the two minhash_signatures implementations.

The whole exact-oracle story for the hash-based dedup queries rests on
these invariants: the DuckDB SQL port (webx/oracle_xxh64.py) is itself
tested against the Python reference, and the Python reference against
the JVM here — so Spark, numpy, and DuckDB all compute the same bits.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from webx import xxh64 as X

STRS = [
    "",
    "a",
    "ab",
    "abc",
    "abcd",
    "abcde",
    "abcdefg",
    "abcdefgh",
    "abcdefghi",
    "hello world",
    "x" * 31,
    "y" * 32,
    "z" * 33,
    "w" * 64,
    "v" * 65,
    "the quick brown fox jumps over the lazy dog",
    "café ü ‰ →",  # multi-byte utf-8
    "word1 word2 word3",
]


def test_hash_bytes_matches_spark(spark):
    df = spark.createDataFrame([(s,) for s in STRS], "v string")
    got = [r["h"] for r in df.select(F.xxhash64("v").alias("h")).collect()]
    exp = [X.to_signed(X.hash_bytes(s.encode("utf-8"))) for s in STRS]
    assert got == exp


def test_hash_long_int_matches_spark(spark):
    longs = [0, 1, -1, 42, 2**62, -(2**62), 123456789012345, -(2**63)]
    df = spark.createDataFrame([(v,) for v in longs], "v long")
    got = [r["h"] for r in df.select(F.xxhash64("v").alias("h")).collect()]
    assert got == [X.to_signed(X.hash_long(v & X.M64)) for v in longs]

    ints = [0, 1, -1, 63, 2**31 - 1, -(2**31)]
    df = spark.createDataFrame([(v,) for v in ints], "v int")
    got = [r["h"] for r in df.select(F.xxhash64("v").alias("h")).collect()]
    assert got == [X.to_signed(X.hash_int(v)) for v in ints]


def test_multiarg_fold_matches_spark(spark):
    """xxhash64(long, int) = hash_int(i, seed=hash_long(h, 42)) — the
    minhash slot pattern; and xxhash64(array<long>, int) — the LSH band
    pattern."""
    pairs = [(123456789, 0), (123456789, 5), (-98765, 63), (0, 0)]
    df = spark.createDataFrame(pairs, "h long, i int")
    got = [r["x"] for r in df.select(F.xxhash64("h", "i").alias("x")).collect()]
    exp = [X.to_signed(X.hash_int(i, X.hash_long(h & X.M64))) for h, i in pairs]
    assert got == exp

    arrs = [([1, 2, -3], 0), ([10**12, -5, 7], 3), ([0], 15)]
    df = spark.createDataFrame(arrs, "a array<long>, b int")
    got = [r["x"] for r in df.select(F.xxhash64("a", "b").alias("x")).collect()]

    def fold(arr, b):
        h = X.SPARK_SEED
        for e in arr:
            h = X.hash_long(e & X.M64, h)
        return X.to_signed(X.hash_int(b, h))

    assert got == [fold(a, b) for a, b in arrs]


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=100), st.integers(0, X.M64))
def test_numpy_long_kernel_matches_python(data, seed):
    # numpy kernel vs scalar reference on random longs/seeds
    v = X.hash_bytes(data)  # arbitrary-ish 64-bit value
    got = X.hash_long_np(np.array([v], dtype=np.uint64), np.uint64(seed))[0]
    assert int(got) == X.hash_long(v, seed)
    got_i = X.hash_int_np(np.array([v & 0xFFFFFFFF]), np.uint64(seed))[0]
    assert int(got_i) == X.hash_int(v & 0xFFFFFFFF, seed)


def test_minhash_slots_np():
    h0 = np.array([12345, X.M64, 0, 2**63], dtype=np.uint64)
    mat = X.minhash_slots_np(h0, 16)
    for r, h in enumerate(h0):
        inner = X.hash_long(int(h))
        for i in range(16):
            assert int(mat[r, i]) == X.hash_int(i, inner)


@pytest.mark.parametrize("n_hashes", [16, 64])
def test_minhash_impls_identical(spark, n_hashes):
    from webx.dedup import minhash_signatures

    texts = [
        (0, "the quick brown fox jumps over the lazy dog again and again"),
        (1, "completely different content with many words to shingle here"),
        (2, "the quick brown fox jumps over the lazy dog again and"),
        (3, "short"),
        (4, ""),
        (5, None),  # NULL text: both impls hash the empty token fold
    ]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    a = {
        r["doc_id"]: r["sig"]
        for r in minhash_signatures(docs, n_hashes, impl="numpy").collect()
    }
    b = {
        r["doc_id"]: r["sig"]
        for r in minhash_signatures(docs, n_hashes, impl="sql").collect()
    }
    assert a == b
    assert len(a) == len(texts)


def test_minhash_neardup_identical_pairs(spark):
    """Full pipeline: numpy and sql signature impls produce the same
    verified near-dup pairs."""
    from webx.dedup import minhash_neardup

    rows = []
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    for i in range(30):
        rows.append((i, f"{base} doc{i} unique tail {i * 7}"))
    rows.append((100, rows[3][1]))  # exact dup of doc 3
    rows.append((101, rows[5][1] + " extra"))  # near dup of doc 5
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(
        (r["id_a"], r["id_b"])
        for r in minhash_neardup(docs, threshold=0.5, impl="numpy").collect()
    )
    b = sorted(
        (r["id_a"], r["id_b"])
        for r in minhash_neardup(docs, threshold=0.5, impl="sql").collect()
    )
    assert a == b
    assert (3, 100) in a and (5, 101) in a


def test_simhash_impls_identical(spark):
    from webx.dedup import simhash

    texts = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "completely different words entirely here now"),
        (2, "the quick brown fox jumps over the lazy cat"),
        (3, "x"),
        (4, ""),
        (5, None),
    ]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    a = {r["doc_id"]: r["simhash"] for r in simhash(docs, impl="numpy").collect()}
    b = {r["doc_id"]: r["simhash"] for r in simhash(docs, impl="sql").collect()}
    assert a == b and len(a) == len(texts)
