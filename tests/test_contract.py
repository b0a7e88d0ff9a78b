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
    # XXH64 port and deterministic-quantizer mirrors (webx/oracles.py)
    assert set(qs) - set(osql) == set()
    for name, sql in osql.items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name
    for name, fn in qs.items():
        assert callable(fn), name


def test_entry_runs(spark):
    import __spark_entry__ as E

    df = E.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"url", "text"}
