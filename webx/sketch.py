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


def _bloom_positions(key_col: str, m_bits: int, k: int):
    """The k bloom bit positions of a key: pmod(xxhash64(key, i), m) for
    i in 0..k-1 — Spark's multi-arg xxhash64 folds the int literal into
    the key hash, so the DuckDB oracle mirrors it as
    xhash_int(i, xxh64_str(key))."""
    return F.array(
        *[
            F.pmod(F.xxhash64(F.col(key_col), F.lit(i)), F.lit(m_bits))
            for i in range(k)
        ]
    )


def bloom_build(
    df: DataFrame, key_col: str = "url", m_bits: int = 1 << 20, k: int = 3
) -> DataFrame:
    """Build a Bloom-filter bitmap over ``key_col`` as a (word, bits)
    table: bit position ``p`` lives in 64-bit word ``p >> 6`` at mask
    ``1 << (p & 63)``; words OR together in ONE hash aggregation whose
    output is at most m_bits/64 rows — the crawl-frontier "seen URL"
    set as a first-class relational sketch (Bloom 1970). Deterministic
    under the fixed hash family, so membership answers (including false
    positives) are engine-reproducible and the oracle recomputes them
    exactly.

    Scale: the build side streams (no collect, one shuffle of k rows per
    key that collapse map-side); the bitmap is m_bits/64 rows regardless
    of corpus size. Size m_bits for the expected key count (~10 bits/key
    for ~1% FP at k=3)."""
    pos = df.select(F.explode(_bloom_positions(key_col, m_bits, k)).alias("pos"))
    return (
        pos.select(
            F.shiftright("pos", 6).alias("word"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias(
                "mask"
            ),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
    )


def bloom_probe(
    bitmap: DataFrame,
    candidates: DataFrame,
    key_col: str = "url",
    m_bits: int = 1 << 20,
    k: int = 3,
    broadcast_bitmap: bool = True,
) -> DataFrame:
    """Probe candidates against a ``bloom_build`` bitmap → (key_col,
    maybe_seen). ``maybe_seen`` false = definitely new (the useful
    direction for a crawl frontier); true = seen or false positive at
    the configured rate. The bitmap joins broadcast by default (a 2^20-
    bit filter is 16K rows); pass ``broadcast_bitmap=False`` for
    giant filters, where the word-key shuffle join is still tiny next to
    the candidate scan."""
    bm = F.broadcast(bitmap) if broadcast_bitmap else bitmap
    cand = candidates.select(key_col).withColumn(
        "pos", F.explode(_bloom_positions(key_col, m_bits, k))
    )
    probed = cand.select(
        key_col,
        F.shiftright("pos", 6).alias("word"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias("mask"),
    ).join(bm, "word", "left")
    hit = F.col("bits").isNotNull() & (
        F.col("bits").bitwiseAND(F.col("mask")) != 0
    )
    return probed.groupBy(key_col).agg(F.bool_and(hit).alias("maybe_seen"))


def _cms_cells(key_col: str, width: int, depth: int):
    """The depth CMS cells of a key: pmod(xxhash64(key, row), width)
    for row 0..depth-1 — same seeded-fold shape as the bloom positions,
    so the DuckDB oracle mirrors each row hash exactly."""
    return F.array(
        *[
            F.pmod(F.xxhash64(F.col(key_col), F.lit(r)), F.lit(width))
            for r in range(depth)
        ]
    )


def cms_build(
    df: DataFrame,
    key_col: str,
    width: int = 1024,
    depth: int = 4,
    weight_col: str | None = None,
) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan 2005) over ``key_col``
    as a (row, cell, cnt) table of at most depth×width rows: each
    occurrence increments cell ``pmod(xxhash64(key, row), width)`` in
    every row. ONE hash aggregation whose input collapses map-side; the
    sketch size is independent of both corpus and key cardinality — the
    streaming-friendly frequency summary behind heavy-hitter and
    join-size estimation at crawl scale. Point estimates overcount by
    at most εN (ε ≈ e/width) with probability 1−δ (δ ≈ e^−depth) and
    NEVER undercount. Deterministic under the fixed hash family, so the
    oracle recomputes every estimate exactly.

    Mergeable: sketches of two corpora union by summing matching
    (row, cell) counts — the property that makes per-partition /
    per-snapshot build-then-merge work without rescans."""
    wgt = F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    cells = df.select(
        F.posexplode(_cms_cells(key_col, width, depth)).alias("row", "cell"),
        wgt.alias("_w"),
    )
    return cells.groupBy("row", "cell").agg(F.sum("_w").alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    width: int = 1024,
    depth: int = 4,
    broadcast_sketch: bool = True,
) -> DataFrame:
    """Point-frequency estimates for ``keys`` → (key_col, estimate):
    min over the depth rows of the key's cell counts (missing cell =
    0). The sketch side broadcasts by default (≤ depth×width rows);
    the probe is one narrow explode + hash join + min aggregate."""
    sk = F.broadcast(sketch) if broadcast_sketch else sketch
    probe = keys.select(key_col).distinct().select(
        key_col, F.posexplode(_cms_cells(key_col, width, depth)).alias("row", "cell")
    )
    return (
        probe.join(sk, ["row", "cell"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("estimate"))
    )


def cms_join_size(a: DataFrame, b: DataFrame) -> DataFrame:
    """Equi-join cardinality estimate from two Count-Min sketches built
    with the SAME (width, depth, key type): |A ⋈ B| ≈ min over rows of
    Σ_cell cntA·cntB (the AMS/CM inner-product estimator, Cormode &
    Muthukrishnan 2005 §4.2) — never an undercount. ONE row out. This
    is the shuffle-free answer to "how big would this join be" that a
    planner (or a human sizing spark.sql.shuffle.partitions) wants
    BEFORE paying for the join: sketches are depth×width rows, the
    estimate joins them cell-wise and folds."""
    prod = (
        a.alias("a")
        .join(b.alias("b"), ["row", "cell"], "inner")
        .groupBy("row")
        .agg(F.sum(F.col("a.cnt") * F.col("b.cnt")).alias("ip"))
    )
    return prod.agg(F.min("ip").alias("join_size_est"))


def hll_registers(
    df: DataFrame,
    value_col: str,
    group_cols: tuple = (),
    p: int = 6,
) -> DataFrame:
    """Per-group HyperLogLog register table → (``group_cols``…,
    register, rho): register = the low ``p`` bits of the 64-bit hash,
    rho = 1 + the number of trailing zero bits of the remaining 58
    bits (sentinel-capped). Flajolet et al. 2007, with the
    register/rho split taken from the LOW end so the signed JVM hash
    and the oracle's unsigned HUGEINT agree without sign gymnastics.

    This is the sketch the KMV docstring said "could only be checked
    rows-only" — untrue once the registers themselves are the output:
    every column is an exact integer, a pure function of the shared
    XXH64, so the full value-hash gate applies. Registers are also the
    MERGEABLE form (elementwise max across shards/streams) — at crawl
    scale you persist this table per partition/day and fold, never the
    raw values. The float cardinality estimate is a driver-side
    function of the 2^p integers (see ``hll_estimate``), kept OUT of
    the gated frame (its 2^p-term float sum is fold-order-dependent).

    Plan: one narrow hash projection + one groupBy (group, register)
    max — map-side partials shrink each task's output to ≤ groups·2^p
    rows. Pure codegen, no Python.
    """
    gcols = list(group_cols)
    m_mask = (1 << p) - 1
    sentinel = 1 << (64 - p - 1)  # caps rho at 64-p when the rest is 0
    h = F.xxhash64(F.col(value_col))
    rest = F.shiftrightunsigned(h, p).bitwiseOR(F.lit(sentinel))
    lowbit = rest.bitwiseAND(rest * F.lit(-1))
    rho = (F.round(F.log2(lowbit)).cast("int") + F.lit(1)).alias("rho")
    regs = df.select(
        *gcols,
        h.bitwiseAND(F.lit(m_mask)).cast("int").alias("register"),
        rho,
    )
    return regs.groupBy(*gcols, "register").agg(F.max("rho").alias("rho"))


def hll_estimate(registers: "list[int]", p: int = 6) -> float:
    """Driver-side HLL estimate from a dense register list (absent
    registers = 0): alpha_m · m² / Σ 2^-M_j with the small-range
    linear-counting correction — the pytest anchor for
    ``hll_registers`` (the gated frame stays integer-only)."""
    import math

    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    dense = list(registers) + [0] * (m - len(registers))
    raw = alpha * m * m / sum(2.0 ** -r for r in dense[:m])
    zeros = sum(1 for r in dense[:m] if r == 0)
    if raw <= 2.5 * m and zeros:
        return m * math.log(m / zeros)
    return raw


def kmv_set_ops(a: DataFrame, b: DataFrame, value_col: str, k: int = 64) -> DataFrame:
    """KMV set-operation estimates between two corpora/snapshots → one
    row (n_seen, n_both, union_est, jaccard, intersect_est): build the
    size-k union sketch (k smallest distinct unsigned hashes over
    A ∪ B), count how many of its members appear in BOTH sides, and
    derive |A ∪ B| ≈ (k-1)/u, J ≈ n_both/n_seen, |A ∩ B| ≈ J·|A ∪ B|
    (Beyer et al. 2007, "On synopses for distinct-value estimation").
    The crawl analytic: how much does today's snapshot overlap
    yesterday's — distinct-URL churn, shared-content mass — WITHOUT
    joining the corpora (the exact join is the thing you can't afford
    at 10^12 rows).

    Deterministic under the fixed hash ⇒ every output column including
    the float estimates is oracle-replayable exactly (the kmv_distinct
    argument). Plan: two narrow distinct-hash projections; the union
    sketch via TakeOrdered(k) — per-partition partials, no global
    window; membership = each side semi-joined against the BROADCAST
    k-row sketch (the corpora are never joined to each other, never
    collected, never reshuffled)."""
    minlong = F.lit(-(1 << 63))
    ha = (
        a.select(F.xxhash64(F.col(value_col)).bitwiseXOR(minlong).alias("h"))
        .distinct()
    )
    hb = (
        b.select(F.xxhash64(F.col(value_col)).bitwiseXOR(minlong).alias("h"))
        .distinct()
    )
    sketch = ha.unionByName(hb).distinct().orderBy("h").limit(k)
    in_a = ha.join(F.broadcast(sketch), "h", "leftsemi")
    both = in_a.join(F.broadcast(hb.join(F.broadcast(sketch), "h", "leftsemi")), "h", "leftsemi")
    stats = sketch.agg(
        F.count("*").cast("long").alias("n_seen"), F.max("h").alias("max_h")
    )
    nb = both.agg(F.count("*").cast("long").alias("n_both"))
    u64d = (
        F.col("max_h").cast("decimal(38,0)")
        + F.expr("CAST(9223372036854775808 AS DECIMAL(38,0))")
    ).cast("double")
    union_est = F.when(
        F.col("n_seen") < k, F.col("n_seen").cast("double")
    ).otherwise(F.lit(float(k - 1)) / (u64d / F.lit(TWO64)))
    jacc = F.col("n_both").cast("double") / F.col("n_seen").cast("double")
    return (
        stats.crossJoin(nb)
        .withColumn("union_est", union_est)
        .withColumn("jaccard", jacc)
        .withColumn("intersect_est", F.col("jaccard") * F.col("union_est"))
        .select("n_seen", "n_both", "union_est", "jaccard", "intersect_est")
    )


def hll_merge(registers: DataFrame, group_cols: tuple = ()) -> DataFrame:
    """Fold HLL register tables → (``group_cols``…, register, rho):
    elementwise max across whatever dimension the input is still
    sliced by (day, shard, snapshot). THE point of keeping sketches in
    register form: a year of daily distinct-user sketches folds into
    the all-time sketch with one tiny groupBy — no rescan of the raw
    events — and the result is bit-identical to computing the sketch
    over the raw union (the q_hll_union oracle gates exactly that
    equivalence: Spark folds daily sketches, DuckDB computes the
    global registers from scratch). Plan: one groupBy over ≤
    slices·2^p rows; map-side partials make each task's output ≤
    groups·2^p."""
    gcols = list(group_cols)
    return registers.groupBy(*gcols, "register").agg(F.max("rho").alias("rho"))
