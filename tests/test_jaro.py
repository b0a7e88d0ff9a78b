"""Jaro-Winkler join (webx/jaro.py) — scorer bit-compatibility and
blocking completeness.

Two load-bearing tests: (1) the byte-level scalar must equal DuckDB's
native ``jaro_winkler_similarity`` DOUBLE-for-DOUBLE on randomized
inputs (the q_jw_join oracle depends on it); (2) the log-banded
byte-length blocking claims EXACT equality with the naive all-pairs
join, checked against a brute-force sweep on adversarial corpora
(short strings over a tiny alphabet — maximal similarity density).
"""

from __future__ import annotations

import random

import duckdb
import pytest
from pyspark.sql import functions as F

from webx.jaro import jaro_winkler_bytes, jw_self_pairs


def test_known_values():
    cases = {
        ("martha", "marhta"): 0.9611111111111111,
        ("dixon", "dicksonx"): 0.8133333333333332,
        ("jellyfish", "smellyfish"): 0.8962962962962964,
        ("abc", "abc"): 1.0,
        ("", "abc"): 0.0,
        ("", ""): 0.0,
        ("ab", "ba"): 0.0,
        # odd mismatched-order count: floor division is observable
        ("zb-acc.a", "b-z-abzx"): 0.5833333333333334,
        # boost threshold is strict jaro > 0.7: prefix 2 but no boost
        ("abcdxxxx", "abcdyyyy"): 0.6666666666666666,
        # bytes, not codepoints: multibyte é breaks the codepoint answer
        ("héllo", "hello"): 0.8400000000000001,
    }
    for (a, b), want in cases.items():
        assert jaro_winkler_bytes(a.encode(), b.encode()) == want, (a, b)


def test_differential_vs_duckdb():
    con = duckdb.connect()
    rnd = random.Random(2024)
    alphabets = ["ab c.xyz-éß日", "abc", "aб"]
    for alpha in alphabets:
        for _ in range(2000):
            a = "".join(rnd.choice(alpha) for _ in range(rnd.randint(0, 14)))
            b = "".join(rnd.choice(alpha) for _ in range(rnd.randint(0, 14)))
            want = con.execute(
                "select jaro_winkler_similarity(?, ?)", [a, b]
            ).fetchone()[0]
            got = jaro_winkler_bytes(a.encode(), b.encode())
            assert got == want, (a, b, want, got)


def _truth(strings, threshold):
    out = set()
    for i in range(len(strings)):
        for j in range(i + 1, len(strings)):
            jw = jaro_winkler_bytes(strings[i].encode(), strings[j].encode())
            if jw >= threshold:
                out.add((i, j, jw))
    return out


@pytest.mark.parametrize("threshold", [0.86, 0.94])
def test_blocking_completeness(spark, threshold):
    rnd = random.Random(31)
    # dense corpus: shared prefixes, varied lengths 1..20, tiny alphabet
    strings = list(
        {
            "web" + "".join(rnd.choice("abcé") for _ in range(rnd.randint(0, 17)))
            for _ in range(160)
        }
    ) + ["x", "xy", "webabab", "webabba"]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(strings)], "id long, s string"
    )
    got = {
        (r.id_a, r.id_b, r.jw)
        for r in jw_self_pairs(df, "id", "s", threshold).collect()
    }
    assert got == _truth(strings, threshold)


def test_threshold_guard(spark):
    df = spark.createDataFrame([(1, "a")], "id long, s string")
    with pytest.raises(ValueError):
        jw_self_pairs(df, "id", "s", 0.8)
