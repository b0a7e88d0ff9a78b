"""Margin-based bitext mining (webx/similarity.py margin_bitext):
planted translation pairs are mined mutually; a hub vector's matches
are margin-penalized below a clean pair's; determinism across
partitionings."""

from __future__ import annotations

import numpy as np

from webx.similarity import margin_bitext


def _mk(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id: long, embedding: array<float>",
    )


def _basis(dim, i, eps=0.0, rng=None):
    v = np.zeros(dim)
    v[i] = 1.0
    if eps and rng is not None:
        v = v + eps * rng.standard_normal(dim)
    return v / np.linalg.norm(v)


def test_planted_pairs_mined_mutually(spark):
    rng = np.random.default_rng(7)
    dim = 16
    # sources 0,2,4 each have a slightly-perturbed twin 1,3,5 on the
    # other side; extra unrelated targets 7,9 fill the neighbor pool
    a = _mk(spark, [(i, _basis(dim, i // 2)) for i in (0, 2, 4)])
    b_rows = [(i, _basis(dim, i // 2, 0.05, rng)) for i in (1, 3, 5)]
    b_rows += [(7, _basis(dim, 11)), (9, _basis(dim, 12))]
    b = _mk(spark, b_rows)
    got = {r["src_id"]: r for r in margin_bitext(a, b, k=3, threshold=1.0).collect()}
    assert {s: got[s]["tgt_id"] for s in got} == {0: 1, 2: 3, 4: 5}
    assert all(r["mutual"] for r in got.values())
    assert all(r["margin"] > 1.2 for r in got.values())


def test_hub_is_penalized(spark):
    dim = 8
    # target 1 is a HUB: moderately close to every source direction;
    # target 3 is a clean twin of source 2 only
    hub = np.ones(dim) / np.sqrt(dim)
    a = _mk(spark, [(0, _basis(dim, 0)), (2, _basis(dim, 1))])
    b = _mk(spark, [(1, hub), (3, _basis(dim, 1))])
    out = {r["src_id"]: r for r in margin_bitext(a, b, k=2, threshold=0.0).collect()}
    # source 2 matches its twin with a higher margin than source 0's
    # forced hub match — the hub's high kNN penalty does the work
    assert out[2]["tgt_id"] == 3
    assert out[2]["margin"] > out[0]["margin"]


def test_partition_independent(spark):
    rng = np.random.default_rng(3)
    rows = [(i, rng.standard_normal(12)) for i in range(40)]
    emb = _mk(spark, rows)
    from pyspark.sql import functions as F

    a = emb.filter(F.col("vec_id") % 2 == 0)
    b = emb.filter(F.col("vec_id") % 2 == 1)
    one = sorted(map(tuple, margin_bitext(a.coalesce(1), b, k=4).collect()))
    par = sorted(map(tuple, margin_bitext(a.repartition(16), b.repartition(8), k=4).collect()))
    assert one == par
