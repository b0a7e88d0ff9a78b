"""Distinct-count sketching — the KMV (k-minimum-values) estimator.

The classic cardinality sketch (Bar-Yossef et al. 2002, "Counting
distinct elements in a data stream"): hash every value to a uniform
64-bit point, keep the k smallest DISTINCT hashes per group; if the
k-th smallest normalizes to u ∈ (0,1], the distinct count estimates as
(k-1)/u. Standard error ≈ 1/√(k−2).

Why KMV here instead of HyperLogLog (``approx_count_distinct``): the
estimate is a DETERMINISTIC function of the value set under a fixed
hash — identical on any partitioning, cluster size, or engine — so the
driver's DuckDB oracle recomputes it EXACTLY via the XXH64 macro port
(webx/oracles.py), where an engine-specific HLL could only be checked
within tolerance. Mergeability is the same as any KMV: union the
k-minima sets and re-take the k smallest.

Plan shape: hash (codegen) → per-group k smallest distinct via a
row_number window over (group, hash) → max + count aggregate. Two
shuffles on the group key, rows shrink to ≤k per group after the
window. At 10^12 rows pre-aggregate ``distinct(group, hash)`` partially
map-side (the groupBy does this automatically).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

TWO64 = float(1 << 64)


def kmv_distinct(
    df: DataFrame,
    value_col: str,
    group_cols: tuple = (),
    k: int = 64,
) -> DataFrame:
    """→ per-group (``group_cols``…, n_seen, estimate) where ``estimate``
    is the KMV distinct-count of ``value_col`` (exact count returned
    when the group has < k distinct values — the sketch is exact below
    its capacity)."""
    gcols = list(group_cols)
    # unsigned comparison of the signed xxhash64: flip the sign bit
    h = F.xxhash64(F.col(value_col)).bitwiseXOR(F.lit(-(1 << 63)))
    hashed = df.select(*gcols, h.alias("h")).distinct()
    w = Window.partitionBy(*gcols).orderBy("h") if gcols else Window.orderBy("h")
    topk = (
        hashed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
    )
    agg = topk.groupBy(*gcols).agg(
        F.count("*").alias("n_seen"), F.max("h").alias("max_h")
    )
    # normalized k-th minimum: recover the exact u64 in DECIMAL first so
    # the double conversion rounds ONCE — bit-identical to the oracle's
    # HUGEINT::DOUBLE (double(signed)+2^63 would round twice and can
    # differ in the last ulp)
    u64d = (
        F.col("max_h").cast("decimal(38,0)")
        + F.expr("CAST(9223372036854775808 AS DECIMAL(38,0))")  # 2^63 > max long
    ).cast("double")
    est = F.when(
        F.col("n_seen") < k, F.col("n_seen").cast("double")  # exact below capacity
    ).otherwise(F.lit(float(k - 1)) / (u64d / F.lit(TWO64)))
    return agg.select(*gcols, "n_seen", est.alias("estimate"))
