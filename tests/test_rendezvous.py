"""Rendezvous/HRW sharding (webx/sampling.py rendezvous_assign)."""

from __future__ import annotations

from pyspark.sql import functions as F

from webx.sampling import rendezvous_assign
from webx.xxh64 import hash_int, hash_long, to_signed


def _ref_assign(key: int, shards) -> int:
    best = None
    for s in shards:
        w = to_signed(hash_int(s, seed=hash_long(key)))
        if best is None or (w, s) > best:
            best = (w, s)
    return best[1]


def test_matches_python_xxh64_reference(spark):
    df = spark.createDataFrame([(i,) for i in range(400)], "doc_id long")
    got = {
        r.doc_id: r.shard
        for r in rendezvous_assign(df, "doc_id", range(8)).collect()
    }
    for k in range(400):
        assert got[k] == _ref_assign(k, range(8)), k


def test_minimal_movement_on_scale_out(spark):
    """THE HRW property: adding shard n moves only keys shard n wins —
    and every key that moves, moves TO the new shard."""
    df = spark.createDataFrame([(i,) for i in range(2000)], "doc_id long")
    a = rendezvous_assign(df, "doc_id", range(8), out_col="sa")
    b = rendezvous_assign(a, "doc_id", range(9), out_col="sb")
    rows = b.collect()
    moved = [r for r in rows if r.sa != r.sb]
    assert all(r.sb == 8 for r in moved)  # movers go to the new shard only
    frac = len(moved) / len(rows)
    assert 0.05 < frac < 0.18  # ~1/9 expected


def test_balance(spark):
    df = spark.createDataFrame([(i,) for i in range(4000)], "doc_id long")
    counts = (
        rendezvous_assign(df, "doc_id", range(8))
        .groupBy("shard")
        .count()
        .collect()
    )
    assert len(counts) == 8
    for r in counts:
        assert 350 < r["count"] < 650  # 500 expected per shard


def test_single_shard(spark):
    df = spark.createDataFrame([(1,)], "doc_id long")
    assert rendezvous_assign(df, "doc_id", [3]).collect()[0].shard == 3


def test_zero_shuffle_plan(spark):
    df = spark.createDataFrame([(1,)], "doc_id long")
    plan = rendezvous_assign(df, "doc_id", range(8))._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
