"""Deterministic sampling/splitting (webx/sampling.py): the properties
Bernoulli sample()/sampleBy() cannot give — partition independence,
append stability, engine independence (oracle-checked in the driver
gate), plus approximate fraction correctness."""

from __future__ import annotations

from pyspark.sql import functions as F

from webx.sampling import hash_bucket, split_assign, stratified_sample


def _docs(spark, n=2000):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "en")
        .when(F.col("id") % 3 == 1, "de")
        .otherwise("fr")
        .alias("lang"),
    )


def test_partition_independence(spark):
    docs = _docs(spark)
    a = set(
        r["doc_id"]
        for r in stratified_sample(docs.repartition(1), "lang", {"en": 0.5, "de": 0.2, "fr": 0.9}).collect()
    )
    b = set(
        r["doc_id"]
        for r in stratified_sample(docs.repartition(17, "lang"), "lang", {"en": 0.5, "de": 0.2, "fr": 0.9}).collect()
    )
    assert a == b and len(a) > 0


def test_append_stability(spark):
    """Adding rows never flips existing rows' split assignment."""
    small = split_assign(_docs(spark, 500))
    big = split_assign(_docs(spark, 2000))
    sm = {r["doc_id"]: r["split"] for r in small.collect()}
    bg = {r["doc_id"]: r["split"] for r in big.collect()}
    assert all(bg[k] == v for k, v in sm.items())


def test_fractions_approximately_met(spark):
    docs = _docs(spark, 3000)
    out = stratified_sample(docs, "lang", {"en": 0.5, "de": 0.2}, default_fraction=0.0)
    counts = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    n_per = 1000  # per stratum
    assert abs(counts.get("en", 0) / n_per - 0.5) < 0.08
    assert abs(counts.get("de", 0) / n_per - 0.2) < 0.08
    assert "fr" not in counts  # default fraction 0 drops unlisted strata


def test_split_covers_all_rows_disjointly(spark):
    out = split_assign(_docs(spark, 1000))
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 1000
    assert abs(counts["train"] / 1000 - 0.8) < 0.06
    assert set(counts) == {"train", "val", "test"}


def test_bucket_range(spark):
    row = (
        _docs(spark, 500)
        .select(hash_bucket("doc_id").alias("b"))
        .agg(F.min("b").alias("lo"), F.max("b").alias("hi"))
        .first()
    )
    assert 0 <= row["lo"] and row["hi"] < 1_000_000
