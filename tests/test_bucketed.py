"""Bucketed co-located joins (webx/layout.py write_bucketed): the
shuffle is paid once at write time; joins and aggregations on the
bucket key then plan with ZERO Exchange. Plan-asserted + correctness
vs the plain join."""

from __future__ import annotations

import uuid

import pytest

from pyspark.sql import functions as F

from tests.test_plans import nodes, plan_of
from webx.layout import read_bucketed, write_bucketed


@pytest.fixture()
def bucketed_pair(spark):
    a_name = f"t_ev_{uuid.uuid4().hex[:8]}"
    b_name = f"t_dim_{uuid.uuid4().hex[:8]}"
    a = spark.range(2000).select(
        (F.col("id") % 37).alias("k"), F.col("id").alias("v")
    )
    b = spark.range(37).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("w")
    )
    write_bucketed(a, a_name, "k", 8, sort_by="k")
    write_bucketed(b, b_name, "k", 8, sort_by="k")
    yield a, b, a_name, b_name
    spark.sql(f"DROP TABLE IF EXISTS {a_name}")
    spark.sql(f"DROP TABLE IF EXISTS {b_name}")


def test_bucketed_join_has_zero_exchange(spark, bucketed_pair):
    _, _, a_name, b_name = bucketed_pair
    ta, tb = read_bucketed(spark, a_name), read_bucketed(spark, b_name)
    with_hint = ta.hint("merge").join(tb, "k")
    plan = plan_of(with_hint)
    assert nodes(plan, "Exchange") == 0  # co-located: shuffle already paid
    assert nodes(plan, "SortMergeJoin") == 1


def test_bucketed_join_matches_plain_join(spark, bucketed_pair):
    a, b, a_name, b_name = bucketed_pair
    ta, tb = read_bucketed(spark, a_name), read_bucketed(spark, b_name)
    got = sorted(map(tuple, ta.join(tb, "k").select("k", "v", "w").collect()))
    want = sorted(map(tuple, a.join(b, "k").select("k", "v", "w").collect()))
    assert got == want


def test_bucketed_groupby_has_zero_exchange(spark, bucketed_pair):
    _, _, a_name, _ = bucketed_pair
    ta = read_bucketed(spark, a_name)
    plan = plan_of(ta.groupBy("k").agg(F.sum("v").alias("s")))
    assert nodes(plan, "Exchange") == 0


def test_unbucketed_baseline_pays_the_exchange(spark, bucketed_pair):
    """Control: the same join on raw (non-catalog) reads DOES shuffle —
    proving the zero-Exchange plans above come from the bucket spec,
    not from AQE or data size."""
    a, b, _, _ = bucketed_pair
    plan = plan_of(a.hint("merge").join(b, "k"))
    assert nodes(plan, "Exchange") >= 2
