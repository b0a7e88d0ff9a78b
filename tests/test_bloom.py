"""Bloom-filter seen-set tests — membership vs a pure-Python replica
built on webx.xxh64 (the JVM-anchored hash port)."""

from __future__ import annotations

from webx import xxh64 as X
from webx.sketch import bloom_build, bloom_probe


def py_positions(key: str, m_bits: int, k: int) -> list:
    """Replicate Spark xxhash64(key, lit(i)) % m: int literal folded
    into the string hash as its seed."""
    h = X.hash_bytes(key.encode(), X.SPARK_SEED)
    return [X.to_signed(X.hash_int(i, h)) % m_bits for i in range(k)]


def py_bloom(keys, m_bits, k):
    bits = set()
    for key in keys:
        bits.update(py_positions(key, m_bits, k))
    return bits


def py_probe(key, bits, m_bits, k):
    return all(p in bits for p in py_positions(key, m_bits, k))


KEYS = [f"https://h{i % 5}.example.com/page/{i}" for i in range(200)]
NOVEL = [f"https://other.example.org/x/{i}" for i in range(200)]


def test_members_always_hit(spark):
    df = spark.createDataFrame([(u,) for u in KEYS], "url string")
    bm = bloom_build(df, "url")
    got = {r.url: r.maybe_seen for r in bloom_probe(bm, df, "url").collect()}
    assert all(got.values()) and len(got) == len(KEYS)


def test_matches_python_replica_including_false_positives(spark):
    # tiny filter (256 bits) so false positives actually occur — the
    # exact FP set must match the hash-faithful Python replica
    m, k = 256, 3
    df = spark.createDataFrame([(u,) for u in KEYS], "url string")
    cand = spark.createDataFrame([(u,) for u in KEYS + NOVEL], "url string")
    bm = bloom_build(df, "url", m_bits=m, k=k)
    got = {r.url: r.maybe_seen for r in bloom_probe(bm, cand, "url", m_bits=m, k=k).collect()}
    bits = py_bloom(KEYS, m, k)
    exp = {u: py_probe(u, bits, m, k) for u in KEYS + NOVEL}
    assert got == exp
    assert all(exp[u] for u in KEYS)  # no false negatives, ever


def test_novel_urls_miss_at_realistic_sizing(spark):
    df = spark.createDataFrame([(u,) for u in KEYS], "url string")
    cand = spark.createDataFrame([(u,) for u in NOVEL], "url string")
    bm = bloom_build(df, "url")  # 2^20 bits for 200 keys -> FP ~ 0
    got = [r.maybe_seen for r in bloom_probe(bm, cand, "url").collect()]
    assert not any(got)


def test_partition_independent(spark):
    df = spark.createDataFrame([(u,) for u in KEYS], "url string")
    a = sorted(map(tuple, bloom_build(df, "url").collect()))
    b = sorted(map(tuple, bloom_build(df.repartition(13), "url").collect()))
    assert a == b


def test_bitmap_is_bounded(spark):
    df = spark.createDataFrame([(u,) for u in KEYS], "url string")
    assert bloom_build(df, "url", m_bits=1 << 12).count() <= (1 << 12) // 64
