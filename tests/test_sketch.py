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


def _freqs(df, key):
    return {r[key]: r["n"] for r in df.groupBy(key).agg(F.count("*").alias("n")).collect()}


def test_cms_never_undercounts_and_is_close(spark):
    from webx.sketch import cms_build, cms_estimate

    df = spark.range(2000).select((F.col("id") % 37).alias("k"))
    sketch = cms_build(df, "k", width=64, depth=4)
    est = {
        r["k"]: r["estimate"]
        for r in cms_estimate(sketch, df, "k", width=64, depth=4).collect()
    }
    true = _freqs(df, "k")
    assert set(est) == set(true)
    for k, t in true.items():
        assert est[k] >= t  # the CMS one-sided guarantee
        assert est[k] <= t + 2000  # trivially bounded by N


def test_cms_exact_when_wide(spark):
    """With width >> distinct keys and collision-free cells, estimates
    are exact counts."""
    from webx.sketch import cms_build, cms_estimate

    df = spark.range(500).select((F.col("id") % 5).alias("k"))
    sketch = cms_build(df, "k", width=8192, depth=4)
    est = {
        r["k"]: r["estimate"]
        for r in cms_estimate(sketch, df, "k", width=8192, depth=4).collect()
    }
    assert est == _freqs(df, "k")


def test_cms_merge_equals_rebuild(spark):
    """Summing two sketches cell-wise == sketching the union — the
    mergeability that allows per-snapshot builds."""
    from webx.sketch import cms_build

    a = spark.range(0, 600).select((F.col("id") % 23).alias("k"))
    b = spark.range(600, 1000).select((F.col("id") % 19).alias("k"))
    merged = (
        cms_build(a, "k", width=32, depth=3)
        .unionByName(cms_build(b, "k", width=32, depth=3))
        .groupBy("row", "cell")
        .agg(F.sum("cnt").alias("cnt"))
    )
    whole = cms_build(a.unionByName(b), "k", width=32, depth=3)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, whole.collect()))


def test_cms_weighted_build(spark):
    from webx.sketch import cms_build, cms_estimate

    df = spark.createDataFrame([(1, 5), (1, 2), (2, 10)], "k long, w int")
    sketch = cms_build(df, "k", width=1024, depth=3, weight_col="w")
    est = {
        r["k"]: r["estimate"]
        for r in cms_estimate(sketch, df, "k", width=1024, depth=3).collect()
    }
    assert est == {1: 7, 2: 10}


def test_cms_partition_independence(spark):
    from webx.sketch import cms_build

    df = spark.range(1000).select((F.col("id") % 41).alias("k"))
    one = cms_build(df.coalesce(1), "k", width=64, depth=4)
    many = cms_build(df.repartition(7), "k", width=64, depth=4)
    assert sorted(map(tuple, one.collect())) == sorted(map(tuple, many.collect()))


def test_cms_join_size_never_undercounts_exact_when_wide(spark):
    from webx.sketch import cms_build, cms_join_size

    a = spark.range(300).select((F.col("id") % 30).alias("k"))
    b = spark.range(200).select((F.col("id") % 20).alias("k"))
    true = a.join(b, "k").count()
    # narrow sketch: collisions inflate, never deflate
    est_narrow = cms_join_size(
        cms_build(a, "k", width=16, depth=3), cms_build(b, "k", width=16, depth=3)
    ).collect()[0]["join_size_est"]
    assert est_narrow >= true
    # wide sketch: collision-free -> exact inner product
    est_wide = cms_join_size(
        cms_build(a, "k", width=4096, depth=3),
        cms_build(b, "k", width=4096, depth=3),
    ).collect()[0]["join_size_est"]
    assert est_wide == true


def test_hll_registers_match_python_reference(spark):
    from webx.sketch import hll_registers
    from webx import xxh64 as X

    df = spark.range(3000).select(
        (F.col("id") % 3).cast("string").alias("g"), (F.col("id") % 700).alias("v")
    )
    got = {
        (r["g"], r["register"]): r["rho"]
        for r in hll_registers(df, "v", ("g",), p=6).collect()
    }
    # independent python replay over the same values
    want: dict = {}
    for i in range(3000):
        g, v = str(i % 3), i % 700
        hu = X.to_unsigned(X.hash_long(v))
        reg = hu & 63
        rest = (hu >> 6) | (1 << 57)
        rho = (rest & -rest).bit_length()  # tz + 1
        k = (g, reg)
        want[k] = max(want.get(k, 0), rho)
    assert got == want


def test_hll_estimate_accuracy_and_merge(spark):
    from webx.sketch import hll_registers, hll_estimate

    df = spark.range(20000).select(
        F.lit("a").alias("g"), (F.col("id") % 5000).alias("v")
    )
    regs = hll_registers(df, "v", ("g",), p=6).collect()
    dense = [0] * 64
    for r in regs:
        dense[r["register"]] = r["rho"]
    est = hll_estimate(dense, p=6)
    assert abs(est / 5000 - 1) < 0.35  # ~2.6 sigma at m=64 (1.04/8 = 13%)
    # mergeability: registers of two halves fold by elementwise max
    lo = hll_registers(df.filter(F.col("v") < 2500), "v", ("g",), p=6).collect()
    hi = hll_registers(df.filter(F.col("v") >= 2500), "v", ("g",), p=6).collect()
    merged = [0] * 64
    for r in list(lo) + list(hi):
        merged[r["register"]] = max(merged[r["register"]], r["rho"])
    assert merged == dense


def test_kmv_set_ops_estimates_track_truth(spark):
    from webx.sketch import kmv_set_ops

    n = 6000
    ids = spark.range(n).select(F.col("id").alias("v"))
    a = ids.filter(F.col("v") % 3 != 0)  # 2/3 n
    b = ids.filter(F.col("v") % 2 != 0)  # 1/2 n
    # union = ids not divisible by 6 missing only multiples of 6: 5/6 n
    # intersection = odd non-multiples of 3: 1/3 n; jaccard = 0.4
    row = kmv_set_ops(a, b, "v", k=256).first()
    assert row["n_seen"] == 256
    assert abs(row["union_est"] / (5 * n / 6) - 1) < 0.2
    assert abs(row["jaccard"] - 0.4) < 0.12
    assert abs(row["intersect_est"] / (n / 3) - 1) < 0.3
    # partition independence (deterministic hash, not sampling luck)
    again = kmv_set_ops(a.repartition(16), b.coalesce(1), "v", k=256).first()
    assert tuple(row) == tuple(again)


def test_kmv_set_ops_exact_below_capacity(spark):
    from webx.sketch import kmv_set_ops

    a = spark.createDataFrame([(i,) for i in range(10)], ["v"])
    b = spark.createDataFrame([(i,) for i in range(5, 15)], ["v"])
    row = kmv_set_ops(a, b, "v", k=64).first()
    # 15 distinct in the union, 5 shared -> sketch holds everything
    assert row["n_seen"] == 15 and row["n_both"] == 5
    assert row["union_est"] == 15.0
    assert abs(row["jaccard"] - 5 / 15) < 1e-12
    assert abs(row["intersect_est"] - 5.0) < 1e-9


def test_hll_merge_equals_global_sketch(spark):
    from webx.sketch import hll_merge, hll_registers

    df = spark.range(8000).select(
        (F.col("id") % 7).alias("day"), (F.col("id") % 1500).alias("v")
    )
    daily = hll_registers(df, "v", ("day",), p=6)
    folded = {
        (r["register"],): r["rho"] for r in hll_merge(daily).collect()
    }
    direct = {
        (r["register"],): r["rho"] for r in hll_registers(df, "v", p=6).collect()
    }
    assert folded == direct
    # grouped fold: keep a coarser slice (day % 2) and still match
    halves = hll_merge(
        daily.withColumn("half", (F.col("day") % 2).cast("int")), ("half",)
    )
    refolded = {
        (r["register"],): r["rho"] for r in hll_merge(halves).collect()
    }
    assert refolded == direct
