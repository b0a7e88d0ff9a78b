"""Z-order layout keys (webx/layout.py): pure-python cross-check,
coordinate monotonicity, locality of the clustered layout, SQL mirror."""

from __future__ import annotations

from pyspark.sql import functions as F

from webx.layout import cluster_by_zorder, zorder_key, zorder_key_sql


def _morton_py(a: int, b: int, bits: int = 31) -> int:
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_matches_pure_python(spark):
    rows = [(i, (i * 37) % 1000, (i * 91) % 1000) for i in range(200)]
    df = spark.createDataFrame(rows, "rid int, a long, b long")
    got = {
        r["rid"]: r["z"]
        for r in df.select("rid", zorder_key("a", "b").alias("z")).collect()
    }
    for rid, a, b in rows:
        assert got[rid] == _morton_py(a, b)


def test_zorder_sql_mirror_agrees(spark):
    import duckdb

    rows = [(i, (i * 57) % 500, (i * 23) % 500) for i in range(100)]
    df = spark.createDataFrame(rows, "rid int, a long, b long")
    spark_z = {
        r["rid"]: r["z"]
        for r in df.select("rid", zorder_key("a", "b", bits=16).alias("z")).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t(rid INT, a BIGINT, b BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    sql_z = dict(
        con.execute(
            f"SELECT rid, {zorder_key_sql('a', 'b', bits=16)} FROM t"
        ).fetchall()
    )
    assert spark_z == sql_z


def test_zorder_masks_high_bits_and_rejects_bad_bits(spark):
    import pytest

    df = spark.createDataFrame([(1, 1 << 40, 3)], "rid int, a long, b long")
    z = df.select(zorder_key("a", "b", bits=8).alias("z")).collect()[0]["z"]
    assert z == _morton_py((1 << 40) & 0xFF, 3, 8)
    with pytest.raises(ValueError):
        zorder_key("a", "b", bits=0)
    with pytest.raises(ValueError):
        zorder_key_sql("a", "b", bits=32)


def test_cluster_by_zorder_tightens_both_dims(spark):
    """After Z-order clustering, per-partition min/max ranges on BOTH
    columns must be far tighter than a random layout — the stat-pruning
    win the layout exists for."""
    n = 4096
    df = spark.range(n).select(
        (F.col("id") % 64).alias("a"),
        (F.floor(F.col("id") / 64)).alias("b"),
    ).repartition(8)  # scrambled input
    files = 16
    clustered = cluster_by_zorder(df, "a", "b", num_files=files, bits=8)
    spans = (
        clustered.groupBy(F.spark_partition_id().alias("p"))
        .agg(
            (F.max("a") - F.min("a")).alias("sa"),
            (F.max("b") - F.min("b")).alias("sb"),
        )
        .collect()
    )
    avg_sa = sum(r["sa"] for r in spans) / len(spans)
    avg_sb = sum(r["sb"] for r in spans) / len(spans)
    # random layout would have span ~63 on both; z-order keeps both
    # bounded well below the full domain
    assert avg_sa < 40 and avg_sb < 40


def test_pruning_report_sorted_vs_scattered(spark, tmp_path):
    """Real-footer evidence for the layout claim: a range-partitioned
    sort lets parquet min/max stats skip ~everything outside a narrow
    predicate; the same rows hash-scattered skip nothing."""
    from webx.layout import pruning_report

    df = spark.range(20000).select(F.col("id").alias("k"))
    sorted_p = str(tmp_path / "sorted")
    scattered_p = str(tmp_path / "scattered")
    df.repartitionByRange(10, "k").write.parquet(sorted_p)
    df.repartition(10).write.parquet(scattered_p)
    good = pruning_report(sorted_p, "k", 0, 999)
    bad = pruning_report(scattered_p, "k", 0, 999)
    assert good["n_files"] >= 10 and good["skip_fraction"] >= 0.8
    assert bad["skip_fraction"] == 0.0


def test_pruning_report_zorder_skips_on_both_dims(spark, tmp_path):
    from webx.layout import cluster_by_zorder, pruning_report

    n = 1 << 14
    df = spark.range(n).select(
        (F.col("id") % 128).alias("a"), F.floor(F.col("id") / 128).alias("b")
    )
    p = str(tmp_path / "z")
    cluster_by_zorder(df, "a", "b", num_files=16, bits=8).write.parquet(p)
    ra = pruning_report(p, "a", 0, 15)
    rb = pruning_report(p, "b", 0, 15)
    # both dimensions must show real skipping from one layout
    assert ra["skip_fraction"] >= 0.5, ra
    assert rb["skip_fraction"] >= 0.5, rb


def test_hive_partitioned_write_prunes_partitions(spark, tmp_path):
    """write.partitionBy + a literal predicate on the partition column:
    the scan must list ONLY the matching directory (PartitionFilters),
    read zero bytes of other languages, and keep the partition column
    out of the data files."""
    from tests.test_plans import plan_of

    p = str(tmp_path / "bylang")
    df = spark.createDataFrame(
        [(i, ["en", "de", "fr"][i % 3], f"t{i}") for i in range(300)],
        "doc_id long, lang string, text string",
    )
    df.write.partitionBy("lang").parquet(p)
    import os

    assert sorted(d for d in os.listdir(p) if d.startswith("lang=")) == [
        "lang=de", "lang=en", "lang=fr"
    ]
    q = spark.read.parquet(p).filter(F.col("lang") == "en").select("doc_id")
    plan = plan_of(q)
    pf = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert pf and "lang" in pf[0]
    assert q.count() == 100


def test_orc_roundtrip_matches_parquet(spark, tmp_path):
    dfp = str(tmp_path / "o.parquet")
    dfo = str(tmp_path / "o.orc")
    df = spark.range(500).selectExpr(
        "id", "concat('s', id % 13) AS s", "CAST(id AS DOUBLE)/7 AS v"
    )
    df.write.parquet(dfp)
    df.write.orc(dfo)
    a = sorted(map(tuple, spark.read.parquet(dfp).collect()))
    b = sorted(map(tuple, spark.read.orc(dfo).collect()))
    assert a == b


def test_zonemap_skip_stats_invariants(spark):
    """rows_match is layout-invariant; a perfect (x-sorted) layout hits
    the ceil(rows_match/capacity) + 1-boundary bound; a hash-scattered
    layout reads every file (min/max span the whole domain)."""
    from webx.layout import zonemap_skip_stats

    n = 1000
    df = spark.range(n).select(
        F.col("id").alias("rid"),
        (F.col("id") * 37 % 100).alias("x"),
        (F.col("id") * 91 % 100).alias("y"),
    )
    layouts = {
        "scatter": [F.xxhash64("rid")],
        "by_x": [F.col("x"), F.col("y"), F.col("rid")],
    }
    out = {
        r.layout: r
        for r in zonemap_skip_stats(
            df, "x", "y", layouts, capacity=50, x_range=(10, 19), y_range=(0, 99)
        ).collect()
    }
    match = out["scatter"].rows_match
    assert match == out["by_x"].rows_match == 100  # 10 x-values x 10 each
    assert out["scatter"].n_files == out["by_x"].n_files == 20
    # scatter: every 50-row file spans nearly the whole x domain -> no skip
    assert out["scatter"].files_read == 20
    # x-sorted: the 100 hits occupy 2 files, +1 for a straddled boundary
    assert out["by_x"].files_read <= 3
    assert out["by_x"].rows_read >= match
