"""Lloyd's KMeans (webx/kmeans.py): planted-cluster recovery,
partition independence (the determinism claim), empty-cluster policy."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from webx.kmeans import kmeans_lloyd


def _blobs(spark, n_per=30, dim=8):
    """Two well-separated blobs: ids 0..n-1 near origin, n..2n-1 near 10."""
    rows = []
    for i in range(2 * n_per):
        base = 0.0 if i < n_per else 10.0
        rows.append((i, [base + ((i * 7 + j) % 5) * 0.01 for j in range(dim)]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_recovers_planted_blobs(spark):
    emb = _blobs(spark)
    out = {r["vec_id"]: r["cid"] for r in kmeans_lloyd(emb, k=2, iters=4).collect()}
    lo = {out[i] for i in range(30)}
    hi = {out[i] for i in range(30, 60)}
    assert len(lo) == 1 and len(hi) == 1 and lo != hi


def test_partition_independent_assignment(spark):
    emb = _blobs(spark, n_per=25)
    a = sorted(map(tuple, kmeans_lloyd(emb.coalesce(1), k=4, iters=3).collect()))
    b = sorted(map(tuple, kmeans_lloyd(emb.repartition(7), k=4, iters=3).collect()))
    assert a == b


def test_missing_init_ids_raise(spark):
    emb = spark.createDataFrame(
        [(5, [0.1, 0.2]), (6, [0.3, 0.4])], "vec_id long, embedding array<float>"
    )
    with pytest.raises(ValueError, match="init"):
        kmeans_lloyd(emb, k=2, iters=1)


def test_empty_cluster_keeps_centroid_and_converges(spark):
    """Seed 3 includes an outlier-free duplicate start: clusters that
    lose all members must not crash or corrupt later iterations."""
    rows = [(i, [float(i % 2), float(i % 2)]) for i in range(40)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    # k=3 but only 2 distinct points -> one cluster goes empty
    out = kmeans_lloyd(emb, k=3, iters=3)
    assert out.count() == 40
    assert out.select("cid").distinct().count() == 2
