"""KMV distinct-count sketch (webx/sketch.py): estimation accuracy vs
exact counts, exact-below-capacity behavior, partition independence."""

from __future__ import annotations

from pyspark.sql import functions as F

from webx.sketch import kmv_distinct


def test_estimate_within_standard_error(spark):
    # 3 groups with known distinct counts 2000 / 500 / 50
    df = spark.range(10000).select(
        F.when(F.col("id") < 6000, "big")
        .when(F.col("id") < 9000, "mid")
        .otherwise("small")
        .alias("g"),
        F.when(F.col("id") < 6000, F.col("id") % 2000)
        .when(F.col("id") < 9000, F.col("id") % 500)
        .otherwise(F.col("id") % 50)
        .alias("v"),
    )
    k = 256  # stderr ~ 1/sqrt(254) ~ 6.3%
    got = {r["g"]: (r["n_seen"], r["estimate"]) for r in kmv_distinct(df, "v", ("g",), k=k).collect()}
    assert abs(got["big"][1] / 2000 - 1) < 0.25  # ~4 sigma
    assert abs(got["mid"][1] / 500 - 1) < 0.25
    # below capacity -> exact
    assert got["small"] == (50, 50.0)


def test_partition_independence(spark):
    df = spark.range(5000).select(
        F.lit("g").alias("g"), (F.col("id") % 1234).alias("v")
    )
    a = kmv_distinct(df.repartition(1), "v", ("g",), k=64).first()["estimate"]
    b = kmv_distinct(df.repartition(23), "v", ("g",), k=64).first()["estimate"]
    assert a == b  # deterministic sketch: identical, not just close


def test_global_no_groups(spark):
    df = spark.range(300).select((F.col("id") % 77).alias("v"))
    row = kmv_distinct(df, "v", k=128).first()
    assert (row["n_seen"], row["estimate"]) == (77, 77.0)
