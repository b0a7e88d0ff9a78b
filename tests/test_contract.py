"""Driver-contract invariants: entry/queries/oracle_sql alignment, plus
config round-trip (goldens reproducible from config alone)."""

from __future__ import annotations

import json

from webx.config import ExtractConfig


def test_config_roundtrip():
    cfg = ExtractConfig(binary_thresh=0.4, repartition=7, size_gears=True)
    d = cfg.to_dict()
    json.dumps(d)  # serializable
    assert ExtractConfig.from_dict(d) == cfg
    assert ExtractConfig.from_dict({}) == ExtractConfig()


def test_config_rejects_unknown_keys():
    import pytest

    with pytest.raises(ValueError, match="unknown config keys"):
        ExtractConfig.from_dict({"box_tresh": 0.5})


def test_entry_contract_alignment():
    import __spark_entry__ as E

    qs = E.queries()
    osql = E.oracle_sql()
    assert len(qs) >= 40
    # every oracle key maps to a query
    assert set(osql) <= set(qs)
    # round 2: EVERY query has a full value-hash oracle — the former
    # rows-only set (minhash/simhash/lsh/ivf) is covered by the DuckDB
    # XXH64 port and deterministic-quantizer mirrors (webx/oracles.py).
    # Exceptions (rows-only BY DESIGN, each pytest-anchored instead):
    # the approx-percentile scale twin (Spark-internal GK sketch — no
    # SQL mirror; exact sibling is the oracle anchor), PageRank (the
    # sanctioned iterative-algorithm category; numpy power-iteration
    # anchor at 1e-9), and the zlib compression-ratio signal (zlib is
    # not SQL-expressible; exact byte counts pytest-anchored in
    # tests/test_compression_ratio.py).
    assert set(qs) - set(osql) == {
        "q_length_percentiles_approx",
        "q_pagerank_hosts",
        "q_compression_ratio",
    }
    for name, sql in osql.items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name
    for name, fn in qs.items():
        assert callable(fn), name


def test_approx_percentile_tracks_exact(spark):
    """The scale-path approx twin must stay within GK rank-error bounds
    of the exact oracle-checked percentiles (here: tiny data ⇒ equal or
    adjacent order statistics)."""
    import __spark_entry__ as E

    import math

    from pyspark.sql import functions as F
    from webx import synth

    sf = "/root/testdata/sf0.001"
    exact = {r["lang"]: r for r in E.q_length_percentiles(spark, sf).collect()}
    approx = {r["lang"]: r for r in E.q_length_percentiles_approx(spark, sf).collect()}
    assert set(exact) == set(approx)
    lens = {}
    for r in (
        synth.load_documents(spark, sf)
        .groupBy("lang")
        .agg(F.sort_array(F.collect_list(F.length("text"))).alias("ls"))
        .collect()
    ):
        lens[r["lang"]] = r["ls"]
    for lang, e in exact.items():
        a = approx[lang]
        assert a["n_docs"] == e["n_docs"]
        vals = lens[lang]
        for p, q in (("p50", 0.5), ("p90", 0.9), ("p99", 0.99)):
            # approx returns an actual order statistic; exact interpolates
            # between the two adjacent ones. With accuracy=10000 and tiny
            # groups the GK rank error is 0: the approx value must be one
            # of the two order statistics bracketing the exact rank.
            rank = q * (len(vals) - 1)
            allowed = {vals[math.floor(rank)], vals[math.ceil(rank)]}
            assert float(a[p]) in {float(v) for v in allowed}, (lang, p, a[p], allowed)


def test_entry_runs(spark):
    import __spark_entry__ as E

    df = E.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"url", "text"}
