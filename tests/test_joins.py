"""as-of join and bucketed range join (webx/joins.py): semantics
(ties, no-match NULLs, payload-NULL atomicity, boundary containment)
and the physical-plan shapes that make them scale."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from webx.joins import asof_join, range_join_bucketed


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_asof_basic_backward_match(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts("2024-01-01T10:00")), (2, 10, _ts("2024-01-01T12:00"))],
        "lid int, k int, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, _ts("2024-01-01T09:00"), "a"),
            (10, _ts("2024-01-01T11:00"), "b"),
            (10, _ts("2024-01-01T13:00"), "c"),
        ],
        "k int, ts timestamp, tag string",
    )
    out = asof_join(left, right, key="k", right_payload=("tag",))
    rows = {r["lid"]: r["tag"] for r in out.collect()}
    assert rows == {1: "a", 2: "b"}  # never the future row "c"


def test_asof_tie_matches_equal_ts(spark):
    left = spark.createDataFrame(
        [(1, 5, _ts("2024-01-01T10:00"))], "lid int, k int, ts timestamp"
    )
    right = spark.createDataFrame(
        [(5, _ts("2024-01-01T10:00"), "same")], "k int, ts timestamp, tag string"
    )
    out = asof_join(left, right, key="k", right_payload=("tag",))
    assert out.collect()[0]["tag"] == "same"  # ts >= right ts includes equality


def test_asof_no_match_yields_nulls_and_keeps_left(spark):
    left = spark.createDataFrame(
        [(1, 5, _ts("2024-01-01T10:00"))], "lid int, k int, ts timestamp"
    )
    right = spark.createDataFrame(
        [(5, _ts("2024-01-02T10:00"), "later"), (6, _ts("2024-01-01T09:00"), "otherkey")],
        "k int, ts timestamp, tag string",
    )
    out = asof_join(left, right, key="k", right_payload=("tag",))
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["tag"] is None


def test_asof_null_payload_column_does_not_leak_older_row(spark):
    """A NULL inside the matched row's payload must stay NULL — not be
    back-filled from an older right row (the struct-carry contract)."""
    left = spark.createDataFrame(
        [(1, 5, _ts("2024-01-01T12:00"))], "lid int, k int, ts timestamp"
    )
    right = spark.createDataFrame(
        [(5, _ts("2024-01-01T09:00"), "old"), (5, _ts("2024-01-01T11:00"), None)],
        "k int, ts timestamp, tag string",
    )
    out = asof_join(left, right, key="k", right_payload=("tag",))
    assert out.collect()[0]["tag"] is None


def test_asof_single_exchange_no_join_node(spark):
    """The whole as-of is ONE hash exchange + window — no join operator,
    no candidate-pair materialization."""
    from tests.test_plans import nodes, plan_of

    left = spark.range(100).select(
        F.col("id").alias("lid"),
        (F.col("id") % 7).alias("k"),
        F.timestamp_seconds(F.col("id") * 60).alias("ts"),
    )
    right = spark.range(50).select(
        (F.col("id") % 7).alias("k"),
        F.timestamp_seconds(F.col("id") * 90).alias("ts"),
        F.col("id").alias("rid"),
    )
    plan = plan_of(asof_join(left, right, key="k", right_payload=("rid",)))
    assert nodes(plan, "SortMergeJoin") == 0
    assert nodes(plan, "BroadcastHashJoin") == 0
    assert nodes(plan, "BroadcastNestedLoopJoin") == 0
    assert nodes(plan, "Exchange") == 1
    assert nodes(plan, "Window") == 1


def test_range_join_boundaries_half_open(spark):
    df = spark.createDataFrame(
        [(1, 0.0), (2, 9.999), (3, 10.0), (4, 25.0), (5, -1.0)],
        "rid int, v double",
    )
    iv = spark.createDataFrame(
        [(0.0, 10.0, "low"), (10.0, 25.0, "high")], "lo double, hi double, band string"
    )
    out = range_join_bucketed(df, iv, "v", bucket_width=4.0)
    got = {r["rid"]: r["band"] for r in out.collect()}
    # 25.0 is outside [10,25); -1 below all bands
    assert got == {1: "low", 2: "low", 3: "high"}


def test_range_join_overlapping_intervals_emit_all_matches(spark):
    df = spark.createDataFrame([(1, 5.0)], "rid int, v double")
    iv = spark.createDataFrame(
        [(0.0, 10.0, "a"), (4.0, 6.0, "b")], "lo double, hi double, band string"
    )
    out = range_join_bucketed(df, iv, "v", bucket_width=3.0)
    assert sorted(r["band"] for r in out.collect()) == ["a", "b"]


def test_range_join_matches_theta_join_on_random_data(spark):
    import random

    rnd = random.Random(7)
    rows = [(i, rnd.uniform(-5, 105)) for i in range(300)]
    df = spark.createDataFrame(rows, "rid int, v double")
    iv_rows = []
    lo = 0.0
    for j in range(9):
        hi = lo + rnd.uniform(0.5, 20)
        iv_rows.append((lo, hi, f"b{j}"))
        lo = hi
    iv = spark.createDataFrame(iv_rows, "lo double, hi double, band string")
    fast = range_join_bucketed(df, iv, "v", bucket_width=5.0)
    slow = df.join(
        iv, (F.col("v") >= F.col("lo")) & (F.col("v") < F.col("hi"))
    )
    cols = ["rid", "v", "band", "lo", "hi"]
    assert sorted(map(tuple, fast.select(cols).collect())) == sorted(
        map(tuple, slow.select(cols).collect())
    )


def test_range_join_is_hash_join_not_bnlj(spark):
    from tests.test_plans import nodes, plan_of

    df = spark.range(1000).select(
        F.col("id").alias("rid"), (F.col("id") % 97).cast("double").alias("v")
    )
    iv = spark.createDataFrame(
        [(float(i * 10), float(i * 10 + 10), f"b{i}") for i in range(10)],
        "lo double, hi double, band string",
    )
    plan = plan_of(range_join_bucketed(df, iv, "v", bucket_width=10.0))
    assert nodes(plan, "BroadcastNestedLoopJoin") == 0
    assert nodes(plan, "CartesianProduct") == 0
    assert (
        nodes(plan, "BroadcastHashJoin") + nodes(plan, "SortMergeJoin") == 1
    )


def test_range_join_degenerate_interval_matches_nothing(spark):
    df = spark.createDataFrame([(1, 3.0)], "rid int, v double")
    iv = spark.createDataFrame([(3.0, 3.0, "empty")], "lo double, hi double, band string")
    assert range_join_bucketed(df, iv, "v", bucket_width=2.0).count() == 0


def test_salted_join_matches_plain_join(spark):
    from webx.joins import salted_join

    big = spark.range(500).select(
        F.col("id").alias("rid"), (F.col("id") % 13).alias("k")
    )
    small = spark.createDataFrame(
        [(i, f"v{i}") for i in range(13)], "k long, tag string"
    )
    plain = big.join(small, "k").select("rid", "k", "tag")
    salted = salted_join(big, small, key="k", salt_buckets=8).select(
        "rid", "k", "tag"
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_left_keeps_unmatched(spark):
    from webx.joins import salted_join

    big = spark.createDataFrame([(1, 10), (2, 99)], "rid int, k int")
    small = spark.createDataFrame([(10, "hit")], "k int, tag string")
    out = {r["rid"]: r["tag"] for r in salted_join(big, small, "k", 4, "left").collect()}
    assert out == {1: "hit", 2: None}


def test_salted_join_salt_is_deterministic(spark):
    """Same input → same bucket assignment (replayable shuffles); also
    a mega-key must actually spread across buckets."""
    from pyspark.sql import functions as F2

    big = spark.range(1000).select(F2.col("id").alias("rid"), F2.lit(7).alias("k"))
    salt = F2.pmod(F2.xxhash64(*[F2.col(c) for c in big.columns]), F2.lit(8))
    a = big.withColumn("s", salt).groupBy("s").count().collect()
    b = big.withColumn("s", salt).groupBy("s").count().collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert len(a) == 8  # the single hot key spreads over all buckets


def test_asof_join_matches_pandas_merge_asof_randomized(spark):
    """Cross-check the union-window as-of against pandas merge_asof
    (an independent implementation) over 30 random key/time layouts.
    One Spark job total: all cases are unioned into a single frame and
    keyed by case id (hypothesis-style coverage without 30 sessions)."""
    import random

    import pandas as pd

    rnd = random.Random(1234)
    lrows, rrows = [], []
    for case in range(30):
        nl, nr = rnd.randint(0, 8), rnd.randint(0, 8)
        for i in range(nl):
            lrows.append((case, i, rnd.randint(0, 3), rnd.randint(0, 100)))
        for j in range(nr):
            rrows.append((case, rnd.randint(0, 3), rnd.randint(0, 100), j * 11))
    left = spark.createDataFrame(lrows, "case int, lid int, k int, ts long")
    right = (
        spark.createDataFrame(rrows, "case int, k int, ts long, payload int")
        .groupBy("case", "k", "ts")
        .agg(F.max("payload").alias("payload"))  # unique per (key, ts)
    )
    from webx.joins import asof_join

    # composite key via a single string col (case|k)
    lc = left.withColumn("ck", F.concat_ws("|", "case", "k"))
    rc = right.withColumn("ck", F.concat_ws("|", "case", "k"))
    got = {
        (r["case"], r["lid"]): r["payload"]
        for r in asof_join(
            lc, rc, key="ck", right_payload=("payload",)
        ).collect()
    }
    lpd = pd.DataFrame(lrows, columns=["case", "lid", "k", "ts"]).sort_values("ts")
    rpd = (
        pd.DataFrame(rrows, columns=["case", "k", "ts", "payload"])
        .groupby(["case", "k", "ts"], as_index=False)["payload"]
        .max()
        .sort_values("ts")
    )
    exp_df = pd.merge_asof(
        lpd, rpd, on="ts", by=["case", "k"], direction="backward"
    )
    for _, row in exp_df.iterrows():
        want = None if pd.isna(row["payload"]) else int(row["payload"])
        assert got[(row["case"], row["lid"])] == want


def test_skew_report_flags_mega_key(spark):
    from webx.joins import skew_report

    df = spark.range(1000).select(
        F.when(F.col("id") < 500, 7).otherwise(F.col("id") % 100).alias("k")
    )
    top = skew_report(df, "k", top_n=3).collect()
    # key 7 gets the planted 500 plus the ids in 500..999 with id%100==7
    assert top[0]["key"] == 7 and top[0]["n"] == 505
    assert top[0]["share"] == 0.505
    assert top[0]["ratio_to_median"] > 50  # median key has ~5 rows


def test_bloom_filtered_join_matches_plain_and_prunes(spark):
    from webx.joins import bloom_filtered_join
    from webx.sketch import bloom_build, bloom_probe

    big = spark.range(5000).select(
        F.col("id").alias("rid"), F.concat(F.lit("k"), F.col("id") % 500).alias("key")
    )
    small = spark.createDataFrame(
        [(f"k{i}", i) for i in range(0, 500, 25)], "key string, payload int"
    )
    got = sorted(
        map(tuple, bloom_filtered_join(big, small, "key").select("rid", "payload").collect())
    )
    want = sorted(map(tuple, big.join(small, "key").select("rid", "payload").collect()))
    assert got == want and len(got) == 200
    # the prefilter really prunes: surviving key count << big-side keys
    bm = bloom_build(small.select("key"), key_col="key")
    survivors = (
        bloom_probe(bm, big.select("key").distinct(), key_col="key")
        .filter(F.col("maybe_seen"))
        .count()
    )
    assert survivors < 100  # 20 true keys + few false positives out of 500
