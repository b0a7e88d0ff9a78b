"""SemDeDup unit tests — planted duplicates pruned, survivors kept."""

from __future__ import annotations

import numpy as np

from webx.similarity import semdedup


def _mk(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )


def test_exact_copies_pruned_keep_min(spark):
    rng = np.random.default_rng(7)
    base = rng.normal(size=(10, 8)).astype("float32")
    vecs = list(base) + [base[0], base[3], base[3]]  # ids 10, 11, 12
    emb = _mk(spark, vecs)
    cents = [list(map(float, base[i])) for i in range(4)]
    got = {r.vec_id: r.keep for r in semdedup(emb, cents, 0.99).collect()}
    assert len(got) == 13
    # components {0,10} and {3,11,12}: minimum survives
    assert got[0] and not got[10]
    assert got[3] and not got[11] and not got[12]
    # everything else untouched
    assert all(got[i] for i in (1, 2, 4, 5, 6, 7, 8, 9))


def test_no_pairs_keeps_everything(spark):
    rng = np.random.default_rng(11)
    emb = _mk(spark, rng.normal(size=(12, 8)).astype("float32"))
    cents = [[0.0] * 8, [1.0] * 8]
    got = [r.keep for r in semdedup(emb, cents, 0.999).collect()]
    assert all(got) and len(got) == 12


def test_cross_cluster_pairs_are_not_pruned(spark):
    """Duplicates assigned to different clusters survive — the SemDeDup
    approximation, asserted so the contract stays explicit."""
    v = [1.0, 0.0, 0.0, 0.0]
    # centroids exactly at v and 2v-direction... identical vector always
    # co-clusters; to force a split, make the duplicate slightly closer
    # to the second centroid in L2 while cosine stays 1
    a = [2.0, 0.0, 0.0, 0.0]
    emb = _mk(spark, [v, a])
    cents = [v, a]
    got = {r.vec_id: r.keep for r in semdedup(emb, cents, 0.99).collect()}
    # v -> cent0, a -> cent1: same direction (cos 1) but different
    # clusters, so both kept
    assert got == {0: True, 1: True}


def test_exact_path_row_fence(spark):
    """cosine_neardup_pairs(method='exact') must refuse to collect a
    corpus above max_exact_rows — BEFORE any driver materialization."""
    import pytest
    from pyspark.sql import functions as F

    from webx.similarity import cosine_neardup_pairs

    emb = spark.range(50).select(
        F.col("id").alias("vec_id"),
        F.array(*[F.rand(seed=1) for _ in range(4)]).alias("embedding"),
    )
    with pytest.raises(ValueError, match="lsh"):
        cosine_neardup_pairs(emb, method="exact", max_exact_rows=10)
    # under the bound the path still works
    out = cosine_neardup_pairs(emb, method="exact", max_exact_rows=100)
    assert out.columns == ["id_a", "id_b", "cos"]


def test_ivf_topk_no_extra_count_and_corpus_count(spark):
    """ivf_topk without corpus_count must not run a full count() job
    (hash-ordered limit sample instead); with corpus_count it samples by
    fraction. Both produce valid top-k output."""
    from pyspark.sql import functions as F

    from webx.similarity import cosine_topk, ivf_topk

    emb = spark.range(300).select(
        F.col("id").alias("vec_id"),
        F.array(
            *[((F.col("id") + 1) * (i + 1) % 17 + 1).cast("double") for i in range(8)]
        ).alias("embedding"),
    )
    queries = emb.filter(F.col("vec_id") < 3)
    for kwargs in ({}, {"corpus_count": 300}):
        got = ivf_topk(emb, queries, k=3, n_centroids=4, n_probe=4, **kwargs)
        pdf = got.toPandas()
        assert set(pdf["query_id"]) == {0, 1, 2}
        assert pdf.groupby("query_id")["rank"].max().eq(3).all()
        # n_probe == n_centroids → every list probed → exact equality
        exact = cosine_topk(emb, queries, k=3).toPandas()
        m = pdf.merge(exact, on=["query_id", "rank"], suffixes=("_i", "_e"))
        assert (m["neighbor_id_i"] == m["neighbor_id_e"]).all()
