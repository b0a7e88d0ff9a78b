"""temperature_sample tests — integer-exact membership vs a Python
replica on the JVM-anchored hash port, plus the rebalancing property."""

from __future__ import annotations

import math

from webx import xxh64 as X
from webx.sampling import BUCKETS, temperature_sample


def py_bucket(doc_id: int, salt: int = 42) -> int:
    # Spark xxhash64(key, lit(salt)): long key folded at seed 42, then
    # the int literal folded at the intermediate hash; pmod of signed
    h = X.hash_int(salt, X.hash_long(X.to_unsigned(doc_id), 42))
    return X.to_signed(h) % BUCKETS


def test_membership_matches_python_replica(spark):
    rows = [(i, ["en"] * 70 + ["de"] * 25 + ["zh"] * 5) for i in range(400)]
    data = [(i, langs[i % 100]) for i, langs in rows]
    df = spark.createDataFrame(data, "doc_id long, lang string")
    got = sorted(r.doc_id for r in temperature_sample(df, target_total=80).collect())

    n = {}
    for _, lang in data:
        n[lang] = n.get(lang, 0) + 1
    w = {k: int(math.floor(math.sqrt(v))) for k, v in n.items()}
    sw = sum(w.values())
    exp = sorted(
        i
        for i, lang in data
        if py_bucket(i) * sw * n[lang] < 80 * BUCKETS * w[lang]
    )
    assert got == exp


def test_rebalances_toward_low_resource(spark):
    # skewed corpus: 9000 en vs 300 zh; alpha=0.5 narrows the 30x gap
    # in expected sample share to sqrt(30) ~ 5.5x
    data = [(i, "en") for i in range(9000)] + [(9000 + i, "zh") for i in range(300)]
    df = spark.createDataFrame(data, "doc_id long, lang string")
    out = temperature_sample(df, target_total=1000).groupBy("lang").count()
    got = {r.lang: r["count"] for r in out.collect()}
    ratio = got["en"] / got["zh"]
    assert 3.5 < ratio < 8  # ~5.5 expected, hash noise tolerated
    assert 800 < sum(got.values()) < 1200


def test_partition_and_append_stability(spark):
    data = [(i, "en" if i % 3 else "fr") for i in range(600)]
    df = spark.createDataFrame(data, "doc_id long, lang string")
    a = sorted(r.doc_id for r in temperature_sample(df, target_total=100).collect())
    b = sorted(
        r.doc_id
        for r in temperature_sample(df.repartition(11), target_total=100).collect()
    )
    assert a == b
