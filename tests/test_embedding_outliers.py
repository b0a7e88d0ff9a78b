"""embedding_outliers — planted far point flagged, ranks deterministic."""

from __future__ import annotations

import numpy as np

from webx.similarity import embedding_outliers


def test_planted_far_point_is_rank_one(spark):
    rng = np.random.default_rng(3)
    tight = rng.normal(0, 0.05, size=(9, 4)).astype("float32")  # hug origin
    far = np.array([[5.0, 5.0, 5.0, 5.0]], dtype="float32")
    vecs = np.vstack([tight, far])
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    cents = [[0.0, 0.0, 0.0, 0.0]]
    got = {r.vec_id: r for r in embedding_outliers(emb, cents, k_far=2).collect()}
    assert got[9].far_rank == 1 and got[9].outlier
    assert sum(1 for r in got.values() if r.outlier) == 2
    assert all(r.cid == 0 for r in got.values())


def test_partition_independent(spark):
    rng = np.random.default_rng(5)
    vecs = rng.normal(size=(40, 8)).astype("float32")
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    cents = [list(map(float, vecs[0])), list(map(float, vecs[1]))]
    a = sorted(map(tuple, embedding_outliers(emb, cents).collect()))
    b = sorted(
        map(tuple, embedding_outliers(emb.repartition(7), cents).collect())
    )
    assert a == b
