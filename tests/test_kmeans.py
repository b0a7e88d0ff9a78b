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


def test_checkpoint_resume_is_bit_identical(spark, tmp_path):
    """Kill after iteration 1 of 3 (simulated by running iters=1 with a
    checkpoint dir — its state file survives), then resume the full
    3-iteration run: assignment must equal the uninterrupted run's."""
    import json
    import os

    emb = _blobs(spark, n_per=25)
    ck = str(tmp_path / "ck")
    clean = sorted(map(tuple, kmeans_lloyd(emb, k=4, iters=3).collect()))

    # phase 1: run only the first iteration, checkpointed
    kmeans_lloyd(emb, k=4, iters=1, checkpoint_dir=ck).collect()
    assert os.path.exists(os.path.join(ck, "iter_0.json"))
    state = json.load(open(os.path.join(ck, "iter_0.json")))
    assert all(isinstance(s, int) for c in state["cents"] for s, n in c)

    # phase 2: resume the full run from the surviving state
    resumed = sorted(
        map(tuple, kmeans_lloyd(emb, k=4, iters=3, checkpoint_dir=ck).collect())
    )
    assert resumed == clean


def test_resume_past_final_update_reproduces_assignment(spark, tmp_path):
    emb = _blobs(spark, n_per=20)
    ck = str(tmp_path / "ck2")
    first = sorted(
        map(tuple, kmeans_lloyd(emb, k=2, iters=2, checkpoint_dir=ck).collect())
    )
    # all checkpoints exist now; a rerun must not iterate again and must
    # return the identical assignment
    rerun = sorted(
        map(tuple, kmeans_lloyd(emb, k=2, iters=2, checkpoint_dir=ck).collect())
    )
    assert rerun == first
