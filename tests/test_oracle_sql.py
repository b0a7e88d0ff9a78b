"""The DuckDB XXH64 port (webx/oracles.py) vs the Python reference
(webx/xxh64.py, itself JVM-verified in test_xxh64.py), plus end-to-end
equality of the SQL oracles with the Spark dedup pipelines.

No Spark session needed for the macro-level tests — they run in ~1s.
"""

from __future__ import annotations

import random

import duckdb
import pytest

from webx import xxh64 as X
from webx.oracles import (
    XXH64_MACROS,
    minhash_oracle_sql,
    simhash_oracle_sql,
    xxh64_str_ctes,
)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for stmt in XXH64_MACROS.split(";"):
        if stmt.strip():
            c.execute(stmt)
    return c


def test_macro_primitives(con):
    rng = random.Random(7)
    vals = [0, 1, X.M64, X.P1, 2**63] + [rng.getrandbits(64) for _ in range(10)]
    for a in vals:
        for b in (1, X.P2, vals[-1]):
            got = con.execute(f"SELECT xmul({a}::HUGEINT, {b}::HUGEINT)").fetchone()[0]
            assert int(got) == (a * b) & X.M64
        got = con.execute(f"SELECT xfmix({a}::HUGEINT)").fetchone()[0]
        assert int(got) == X._fmix(a)
        for s in (1, 11, 23, 27, 31):
            got = con.execute(f"SELECT xrotl({a}::HUGEINT, {s})").fetchone()[0]
            assert int(got) == X._rotl(a, s)


def test_macro_hash_long_int(con):
    rng = random.Random(8)
    for _ in range(25):
        v, seed = rng.getrandbits(64), rng.getrandbits(64)
        got = con.execute(
            f"SELECT xhash_long({v}::HUGEINT, {seed}::HUGEINT)"
        ).fetchone()[0]
        assert int(got) == X.hash_long(v, seed)
        i = rng.getrandbits(31)
        got = con.execute(
            f"SELECT xhash_int({i}::HUGEINT, {seed}::HUGEINT)"
        ).fetchone()[0]
        assert int(got) == X.hash_int(i, seed)


def test_sql_string_hash_all_length_classes(con):
    strs = (
        ["", "a", "abc", "abcd", "abcdefg", "abcdefgh", "abcdefghijk"]
        + ["x" * n for n in (12, 16, 20, 31, 32, 33, 40, 63, 64, 65, 100)]
        + ["the quick brown fox", "café ü ‰ →", "word1 word2 word3"]
    )
    vals = ", ".join(f"({i}, '{s}')" for i, s in enumerate(strs))
    con.execute(f"CREATE OR REPLACE TEMP TABLE xs AS SELECT * FROM (VALUES {vals}) v(id, s)")
    sql = (
        "WITH "
        + xxh64_str_ctes("xs", "id, s", "s")
        + " SELECT id, s, h FROM xh_out ORDER BY id"
    )
    for _, s, h in con.execute(sql).fetchall():
        assert int(h) == X.hash_bytes(s.encode("utf-8")), repr(s)


def _spark_pairs(fn, spark, sf):
    return sorted((r["id_a"], r["id_b"]) for r in fn(spark, sf).collect())


def _oracle_pairs(sql, sf):
    c = duckdb.connect()
    c.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    return sorted(tuple(r) for r in c.execute(sql).fetchall())


@pytest.mark.slow
def test_minhash_oracle_equals_spark(spark):
    import __spark_entry__ as E

    sf = "/root/testdata/sf0.001"
    assert _spark_pairs(E.q_dedup_minhash, spark, sf) == _oracle_pairs(
        minhash_oracle_sql(threshold=0.6), sf
    )


@pytest.mark.slow
def test_simhash_oracle_equals_spark(spark):
    import __spark_entry__ as E

    sf = "/root/testdata/sf0.001"
    assert _spark_pairs(E.q_dedup_simhash, spark, sf) == _oracle_pairs(
        simhash_oracle_sql(max_hamming=3), sf
    )


@pytest.mark.slow
def test_minhash_oracle_generalizes_shingle_k(spark):
    """The oracle's signature stage is generated for any k — k=2 must
    mirror the Spark pipeline with shingle_k=2 exactly."""
    import duckdb as _d

    from webx.dedup import minhash_neardup

    sf = "/root/testdata/sf0.001"
    import __spark_entry__ as E

    docs = E._docs_with_neardups(spark, sf)
    got = sorted(
        (r["id_a"], r["id_b"])
        for r in minhash_neardup(docs, shingle_k=2, threshold=0.6).collect()
    )
    assert got == _oracle_pairs(
        minhash_oracle_sql(shingle_k=2, threshold=0.6), sf
    )


def test_sql_string_hash_random_unicode(con):
    """Property check: 120 pseudo-random unicode strings (mixed ASCII /
    multibyte / emoji / long) through the SQL byte-level XXH64 must match
    the Python reference byte-for-byte. One batched query."""
    import random as _r

    rng = _r.Random(1234)
    pool = "abcdefghij KLMNOP 0123456789 _-.,!? éü漢字🎉  "
    strs = [
        "".join(rng.choice(pool) for _ in range(rng.randrange(0, 120)))
        for _ in range(120)
    ]
    con.execute("CREATE OR REPLACE TEMP TABLE rs (id INT, s VARCHAR)")
    con.executemany("INSERT INTO rs VALUES (?, ?)", list(enumerate(strs)))
    sql = (
        "WITH "
        + xxh64_str_ctes("rs", "id, s", "s")
        + " SELECT id, s, h FROM xh_out ORDER BY id"
    )
    for i, s, h in con.execute(sql).fetchall():
        assert int(h) == X.hash_bytes(s.encode("utf-8")), (i, repr(s))
