"""Aggregation patterns that change the shuffle, not the answer.

``topk_per_key``: the per-key top-k LOOKS like it shuffles the whole
corpus (window + rank filter), but since Spark 3.5 the optimizer
rewrites a rank-filtered window into ``WindowGroupLimit`` with a
PARTIAL phase that prunes each map partition to its local top-k
BEFORE the exchange — at most k rows per (input partition, key) ever
shuffle, the ORDER BY/LIMIT analog of map-side combine. The lesson is
altitude: we A/B'd a hand-rolled two-phase variant (local window on
(spark_partition_id, key) then global) and it was strictly WORSE — a
window partitioned on spark_partition_id still demands its own hash
exchange, so the "local" phase added a full extra shuffle on top of
the one the optimizer already prunes (plan dump in PLANS.md). Declare
the plan, let Catalyst pick the physical strategy; the plan test
asserts the Partial WindowGroupLimit is really there so an engine
regression (or a non-row_number rank that defeats the rewrite) fails
loudly.

``cogroup_stats``: `groupBy().cogroup().applyInPandas` — Spark's
two-sided grouped-map. Both inputs shuffle ONCE on the key and arrive
as aligned pandas frames per key; the callable sees a key's full slice
of BOTH tables without any join materialization. The right tool when
per-key logic needs both sides at once and is awkward as a join
(interleaved walks, per-key reconciliation). Arrow-batched, no
per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def topk_per_key(
    df: DataFrame,
    key: str,
    order_col: str,
    k: int,
    ascending: bool = False,
    tiebreak: str | None = None,
) -> DataFrame:
    """Top-``k`` rows per ``key`` by ``order_col`` (desc by default),
    deterministic via ``tiebreak`` (a unique-within-key column,
    defaults to ``order_col`` — pass one if values can tie). Must stay
    a ``row_number`` + ``<=`` filter: that exact shape triggers the
    WindowGroupLimit partial-pruning rewrite."""
    tb = tiebreak or order_col
    oc = F.col(order_col).asc() if ascending else F.col(order_col).desc()
    w = Window.partitionBy(key).orderBy(oc, F.col(tb).asc())
    return (
        df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def cogroup_stats(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
) -> DataFrame:
    """Per-key reconciliation of two tables via cogroup: (key, n_left,
    n_right, first_left_ts, first_right_ts, n_right_before_first_left)
    — the last field is the cross-side question ("how much right-side
    activity predates the first left event?") that a join would answer
    with a per-key fan-out and this answers with one aligned pass."""
    import pandas as pd

    schema = (
        f"{key} long, n_left long, n_right long, "
        "first_left_ts timestamp, first_right_ts timestamp, "
        "n_right_before_first_left long"
    )

    def fn(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        kv = l[key].iloc[0] if len(l) else r[key].iloc[0]
        fl = l[left_ts].min() if len(l) else pd.NaT
        fr = r[right_ts].min() if len(r) else pd.NaT
        before = int((r[right_ts] < fl).sum()) if len(l) and len(r) else 0
        return pd.DataFrame(
            [
                {
                    key: kv,
                    "n_left": len(l),
                    "n_right": len(r),
                    "first_left_ts": fl,
                    "first_right_ts": fr,
                    "n_right_before_first_left": before,
                }
            ]
        )

    return (
        left.groupBy(key)
        .cogroup(right.groupBy(key))
        .applyInPandas(fn, schema=schema)
    )
