"""Two-phase top-k and cogroup reconciliation (webx/agg.py)."""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from webx.agg import cogroup_stats, topk_per_key


def test_topk_matches_plain_window(spark):
    df = spark.range(5000).select(
        (F.col("id") % 50).alias("k"),
        ((F.col("id") * 37) % 1000).alias("v"),
        F.col("id").alias("uid"),
    ).repartition(11)
    got = topk_per_key(df, "k", "v", 5, tiebreak="uid")
    w = Window.partitionBy("k").orderBy(F.col("v").desc(), F.col("uid").asc())
    want = (
        df.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= 5)
    )
    cols = ["k", "v", "uid", "rank"]
    assert sorted(map(tuple, got.select(cols).collect())) == sorted(
        map(tuple, want.select(cols).collect())
    )


def test_topk_ascending_and_small_groups(spark):
    df = spark.createDataFrame(
        [(1, 9, 1), (1, 3, 2), (2, 5, 3)], "k int, v int, uid int"
    )
    got = {
        (r["k"], r["rank"]): r["v"]
        for r in topk_per_key(df, "k", "v", 2, ascending=True, tiebreak="uid").collect()
    }
    assert got == {(1, 1): 3, (1, 2): 9, (2, 1): 5}


def test_topk_partial_prune_runs_before_exchange(spark):
    """Catalyst must rewrite the rank filter into WindowGroupLimit with
    a Partial phase BEFORE the exchange (map-side top-k pruning) — the
    reason the plain window is already the scale-correct formulation."""
    from tests.test_plans import plan_of

    df = spark.range(1000).select(
        (F.col("id") % 5).alias("k"), F.col("id").alias("v")
    )
    plan = plan_of(topk_per_key(df, "k", "v", 3))
    assert "WindowGroupLimit" in plan and "Partial" in plan
    # the Partial limit must appear earlier in the tree than the Exchange
    assert plan.index("Partial") < plan.index("Final")
    assert plan.count("Exchange") >= 1


def test_cogroup_stats_cross_side_counts(spark):
    import datetime as dt

    t0 = dt.datetime(2026, 1, 1)

    def row(i, uid, minutes):
        return (i, t0 + dt.timedelta(minutes=minutes), uid)

    left = spark.createDataFrame(
        [row(1, 1, 60), row(2, 2, 10)], "event_id long, ts timestamp, user_id long"
    )
    right = spark.createDataFrame(
        [row(10, 1, 30), row(11, 1, 50), row(12, 1, 70), row(13, 3, 0)],
        "event_id long, ts timestamp, user_id long",
    )
    out = {r["user_id"]: r for r in cogroup_stats(left, right, "user_id").collect()}
    assert out[1]["n_right_before_first_left"] == 2  # 30, 50 < 60
    assert out[1]["n_left"] == 1 and out[1]["n_right"] == 3
    assert out[2]["n_right"] == 0 and out[2]["first_right_ts"] is None
    assert out[3]["n_left"] == 0 and out[3]["n_right_before_first_left"] == 0
