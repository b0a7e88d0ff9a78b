"""Similarity search over embedding columns (array<float>).

* ``cosine_topk`` — brute-force exact top-k: broadcast the (small) query
  set against the corpus; dot products via ``zip_with``/``aggregate``
  (JVM, codegen) — the exactness baseline.
* ``lsh_topk`` — random-hyperplane LSH bucketing: sign-bit bucket per
  vector (planes are a deterministic seeded literal), candidates share a
  bucket → exact rerank within bucket. The scale path: the corpus×query
  cross product shrinks to per-bucket joins.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window, functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x * y).cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: (x * x).cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_topk(
    corpus: DataFrame, queries: DataFrame, k: int = 5, exclude_self: bool = True
) -> DataFrame:
    """(query_id, rank, neighbor_id, cos) — exact brute force.

    ``queries`` must be small (it is broadcast); corpus scan stays narrow
    until the final per-query top-k (a single shuffle of k×|queries| rows
    thanks to rank-filter pushdown into the window sort)."""
    q = queries.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    c = corpus.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("c_emb")
    )
    joined = c.crossJoin(F.broadcast(q))
    if exclude_self:
        joined = joined.filter(F.col("neighbor_id") != F.col("query_id"))
    cos = (_dot("q_emb", "c_emb") / (_norm("q_emb") * _norm("c_emb"))).alias("cos")
    scored = joined.select("query_id", "neighbor_id", cos)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id")  # deterministic tie-break
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cos")
    )


def cosine_neardup_pairs(emb: DataFrame, threshold: float = 0.95) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a, id_b, cos) with
    id_a < id_b and cos >= threshold.

    This is the EXACT baseline (all-pairs — O(n²), fine up to ~10^5
    vectors per run); the scale path first buckets by random-hyperplane
    LSH (see ``lsh_topk``) so the cross product shrinks to per-bucket
    joins, trading recall for cost."""
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("e_a"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("e_b"))
    cos = (_dot("e_a", "e_b") / (_norm("e_a") * _norm("e_b"))).alias("cos")
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cos)
        .filter(F.col("cos") >= threshold)
    )


def hyperplanes(dim: int, n_planes: int = 8, seed: int = 42) -> list:
    """Deterministic random hyperplanes as a plain nested list literal."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def _bucket(emb_col, planes: list):
    """Sign-bit bucket id of a vector against the plane set (JVM expr)."""
    bucket = F.lit(0)
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        bit = F.when(_dot(emb_col, plane) > 0, F.lit(1 << i)).otherwise(F.lit(0))
        bucket = bucket + bit
    return bucket


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 6,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket.

    Recall < 1 by construction; rerank within bucket is exact. At scale,
    bucket the corpus once (write bucketed/partitioned by bucket id) and
    reuse across query batches."""
    planes = hyperplanes(dim, n_planes, seed)
    c = corpus.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_emb"),
        _bucket(F.col("embedding"), planes).alias("bucket"),
    )
    q = queries.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        _bucket(F.col("embedding"), planes).alias("bucket"),
    )
    joined = c.join(F.broadcast(q), "bucket").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    cos = (_dot("q_emb", "c_emb") / (_norm("q_emb") * _norm("c_emb"))).alias("cos")
    scored = joined.select("query_id", "neighbor_id", cos)
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cos")
    )
