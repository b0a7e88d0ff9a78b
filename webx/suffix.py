"""Distributed suffix array by prefix doubling + adjacent-suffix LCP —
the data structure behind exact-substring dedup (Lee et al. 2022,
"Deduplicating Training Data Makes Language Models Better").

webx/dedup.py's ``duplicate_spans`` is the practical k-token-window
relaxation of that paper; this module builds the real thing, so
repeated passages of ANY length ≥ L surface without k-quantization:
every maximal repeat appears as at least one ADJACENT pair in suffix
order with LCP ≥ L (the classic SA property), so one linear pass over
SA neighbors finds them all — no quadratic pair join anywhere.

Algorithm (Manber-Myers prefix doubling, the textbook distributed
formulation): suffixes are (doc_id, pos) rows; rank_0 = dense rank of
the first ``base`` characters; the stage at width W re-ranks by the
pair (rank[pos], rank[pos + W]) — doubling the compared span — until
either all ranks are distinct (early stop: further stages are provably
rank-stable) or the span covers ``max_chars``. Each stage is ONE
ranked pass + ONE equi-join — O(log(max_chars/base)) rounds total, the
published scale shape.

Dense rank WITHOUT a single-partition window: Spark's rank/dense_rank
over a global ORDER BY collapses to one task — the scale-killer this
module must not have. ``global_dense_rank`` instead range-partitions
the distinct key set, sorts within partitions, collects only the P
per-partition counts to the driver (P rows, never data), and assigns
rank = partition_offset + local_index inside Arrow batches. Equal keys
cannot straddle a range boundary (the range partitioner routes by key
comparison), so offset + local index IS the global dense rank.

Scale bound, stated honestly: a suffix array is built per SHARD (the
paper runs ~100 GB units), not over 100 TB at once; cross-shard
duplicates are caught by the k-window hash pass (webx/dedup.py) or by
sharding on content hash. The orchestration around that unit lives in
``jobs/suffix_shards.py``: route → per-shard SA → disjoint merge, with
the co-location contract proven N-invariant in
tests/test_suffix_shards.py. ``max_chars`` caps per-document suffix
fan-out exactly like winnowing's prefix_chars.

Determinism: ranks are dense ranks of a total order on (key) with ties
impossible (keys are distinct); the final SA order breaks equal-suffix
ties by (doc_id, pos). The DuckDB oracle replays the same stages with
window dense_rank (fine at oracle scale) — equality proves the
two-phase distributed rank assignment is exactly the dense rank.
"""

from __future__ import annotations

from typing import Tuple

from pyspark.sql import DataFrame, functions as F


def _dense_rank_with_count(
    df: DataFrame, key_cols: "list[str]", out_col: str
) -> Tuple[DataFrame, int]:
    """Dense rank (1-based) of the distinct ``key_cols`` tuples under
    their ascending sort order → (DataFrame[*key_cols, out_col],
    n_distinct), without ever sorting in a single task and without any
    Python stage: range-partition the distinct key set (one eager
    localCheckpoint pins the sampled bounds so the count pass and the
    rank pass see the SAME partitioning), collect only the P
    per-partition counts, then rank = literal_offset(pid) +
    row_number over (PARTITION BY pid ORDER BY keys) — all codegen.
    Equal keys cannot straddle a range boundary, so offset + local
    index IS the global dense rank."""
    from pyspark.sql import Window

    spark = df.sparkSession
    p = spark.sparkContext.defaultParallelism
    d = (
        df.select(*key_cols)
        .distinct()
        .repartitionByRange(p, *key_cols)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint()
    )
    counts = {r["__pid"]: r["cnt"] for r in
              d.groupBy("__pid").agg(F.count("*").alias("cnt")).collect()}
    total = sum(counts.values())
    offset = F.lit(0)
    acc = 0
    for pid in sorted(counts):
        offset = F.when(F.col("__pid") == pid, F.lit(acc)).otherwise(offset)
        acc += counts[pid]
    w = Window.partitionBy("__pid").orderBy(*key_cols)
    ranked = d.select(
        *key_cols,
        (offset + F.row_number().over(w)).cast("long").alias(out_col),
    )
    return ranked, total


def global_dense_rank(
    df: DataFrame, key_cols: "list[str]", out_col: str = "r"
) -> DataFrame:
    """See :func:`_dense_rank_with_count` (public single-value form)."""
    ranked, _ = _dense_rank_with_count(df, key_cols, out_col)
    return ranked


def _suffixes(docs: DataFrame, max_chars: int, text_col: str) -> DataFrame:
    """(doc_id, pos, s): every suffix of the ``max_chars``-char document
    PREFIX (the winnowing prefix_chars discipline — capping suffix
    STARTS instead would delete interior rank lookups and corrupt the
    order between a short suffix and a longer one sharing its prefix).
    ``s`` is the full tail of the clipped document; the O(L²)-bytes
    fan-out per doc is the price every shingle explode here pays."""
    t = F.substring(F.col(text_col), 1, max_chars)
    return docs.select(
        "doc_id",
        t.alias("__t"),
    ).select(
        "doc_id",
        F.explode(F.sequence(F.lit(1), F.length("__t"))).alias("pos"),
        F.col("__t"),
    ).select(
        "doc_id",
        "pos",
        F.expr(f"substring(__t, pos, {max_chars})").alias("s"),
    )


def suffix_array(
    docs: DataFrame,
    max_chars: int = 48,
    text_col: str = "text",
    base: int = 8,
    method: str = "direct",
) -> DataFrame:
    """→ (doc_id, pos, s, sa): the suffix array of all per-document
    suffixes (clipped to ``max_chars``), ``sa`` the 1-based position in
    suffix order (ties between byte-identical clipped suffixes broken
    by (doc_id, pos)).

    ``method="direct"`` (default): every row already carries the
    COMPLETE clipped suffix in ``s`` (``_suffixes`` materializes the
    full tail — the LCP passes downstream need it anyway), so suffix
    order IS the string order of (s, doc_id, pos) and ONE ranked pass
    assigns the whole array — no rounds, no per-stage joins. This is
    the right call whenever the row width O(max_chars) is already
    being paid, which this module always does.

    ``method="doubling"``: Manber-Myers prefix doubling — the textbook
    distributed formulation, kept as the shape a low-memory variant
    needs when rows carry only a ``base``-char prefix instead of the
    full suffix (rank lookups replace string comparison). ``base``:
    rank_0 covers the first ``base`` characters directly (a dense rank
    of a short prefix costs the same one ranked pass as a single
    character), so the doubling needs ceil(log2(max_chars/base))
    stages instead of log2(max_chars). Result-identical to "direct"
    (differential-tested); ~3 extra shuffles per stage.
    """
    suf = _suffixes(docs, max_chars, text_col)
    if method == "direct":
        sa = global_dense_rank(
            suf.select("doc_id", "pos", "s"), ["s", "doc_id", "pos"], "sa"
        )
        return sa.select("doc_id", "pos", "s", "sa")
    if method != "doubling":
        raise ValueError(f"unknown suffix_array method: {method!r}")
    # rank_0: first `base` characters (dense)
    pfx = F.substring("s", 1, base)
    r0 = global_dense_rank(suf.select(pfx.alias("c")), ["c"])
    cur = suf.join(r0, pfx == r0["c"]).select(
        "doc_id", "pos", "s", F.col("r").alias("rank")
    ).localCheckpoint()
    n = cur.count()  # cheap: cur is materialized
    width = base
    while width < max_chars:
        nxt = cur.select(
            F.col("doc_id").alias("jd"),
            (F.col("pos") - width).alias("jp"),
            F.col("rank").alias("rank2"),
        )
        paired = cur.join(
            nxt,
            (F.col("doc_id") == F.col("jd")) & (F.col("pos") == F.col("jp")),
            "left",
        ).select(
            "doc_id", "pos", "s", "rank",
            F.coalesce("rank2", F.lit(0)).alias("rank2"),
        )
        rr, n_distinct = _dense_rank_with_count(
            paired.select("rank", "rank2"), ["rank", "rank2"], "nr"
        )
        cur = paired.join(rr, ["rank", "rank2"]).select(
            "doc_id", "pos", "s", F.col("nr").alias("rank")
        ).localCheckpoint()
        width *= 2
        if n_distinct == n:
            break  # all ranks distinct: further doubling is a no-op
    # final SA index: (rank, doc_id, pos) is already unique, so the
    # ranked pass can carry `s` as a trailing key instead of paying a
    # join-back shuffle to re-fetch it
    sa = global_dense_rank(
        cur.select("rank", "doc_id", "pos", "s"),
        ["rank", "doc_id", "pos", "s"],
        "sa",
    )
    return sa.select("doc_id", "pos", "s", "sa")


def with_lcp(df: DataFrame, a: str, b: str, cap: int, out_col: str) -> DataFrame:
    """Common-prefix length of string columns ``a``/``b`` — EXACT for
    lcp < 2*cap-1 and saturating at 2*cap-1 (cap a power of two).

    Spark-side this is ONE codegen expression: position of the first
    per-character null-safe-equality failure over the zipped char
    arrays (clamped to 2*cap-1 chars; ``x <=> y`` makes the padded null
    on the shorter side compare false, so a strict-prefix pair stops at
    the shorter length, and position 0 = "no failure" = equal clamped
    prefixes). The equivalent binary substring CASCADE (what the DuckDB
    oracle replays, :func:`lcp_chain_sql`) is NOT used here: Catalyst
    inlines the accumulator chain into one >64 KB generated method and
    the whole stage falls back to interpreted mode — measured 5.5s vs
    sub-second for the zip_with form on 240k pairs. The driver gates
    cross-engine VALUE equality, not expression shape."""
    assert cap & (cap - 1) == 0 and cap >= 1
    lim = 2 * cap - 1
    p_expr = (
        f"array_position(zip_with(split(substring({a}, 1, {lim}), ''), "
        f"split(substring({b}, 1, {lim}), ''), (x, y) -> x <=> y), false)"
    )
    lcp = (
        f"CAST(CASE WHEN ({p_expr}) = 0 THEN "
        f"least(length(substring({a}, 1, {lim})), "
        f"length(substring({b}, 1, {lim}))) "
        f"ELSE ({p_expr}) - 1 END AS INT)"
    )
    return df.withColumn(out_col, F.expr(lcp))


def lcp_chain_sql(src_sql: str, a: str, b: str, cap: int, keep: str = "*") -> str:
    """DuckDB mirror of :func:`with_lcp`: the same per-step accumulator
    as nested subqueries (the hilbert_key_sql _chain discipline).
    Result column is ``lcp``."""
    assert cap & (cap - 1) == 0 and cap >= 1
    q = f"SELECT *, 0 AS lcp FROM ({src_sql})"
    step = cap
    while step >= 1:
        q = (
            f"SELECT * REPLACE (lcp + (CASE WHEN "
            f"length(substring({a}, lcp + 1, {step})) = {step} "
            f"AND substring({a}, lcp + 1, {step}) = "
            f"substring({b}, lcp + 1, {step}) THEN {step} ELSE 0 END) AS lcp) "
            f"FROM ({q})"
        )
        step //= 2
    return f"SELECT {keep} FROM ({q})"


def adjacent_dup_pairs(
    docs: DataFrame,
    min_lcp: int = 20,
    max_chars: int = 48,
    lcp_cap: int = 32,
    text_col: str = "text",
    base: int = 8,
    method: str = "direct",
) -> DataFrame:
    """Cross-document duplicated passages from SA adjacency →
    (id_a, id_b, max_lcp, n_adj): for every unordered doc pair that is
    ADJACENT somewhere in suffix order with common prefix ≥ ``min_lcp``
    chars, the longest such prefix (capped at ``lcp_cap``) and the
    number of adjacent witnesses. One equi-join on sa+1 — the linear
    neighbor pass; no pair explosion."""
    sa = suffix_array(
        docs, max_chars=max_chars, text_col=text_col, base=base, method=method
    )
    left = sa.select(
        F.col("sa").alias("i"),
        F.col("doc_id").alias("d1"),
        F.col("s").alias("s1"),
    )
    right = sa.select(
        (F.col("sa") - 1).alias("i"),
        F.col("doc_id").alias("d2"),
        F.col("s").alias("s2"),
    )
    adj = left.join(right, "i").filter(F.col("d1") != F.col("d2"))
    adj = with_lcp(adj, "s1", "s2", lcp_cap, "lcp")
    return (
        adj.select(
            F.least("d1", "d2").alias("id_a"),
            F.greatest("d1", "d2").alias("id_b"),
            "lcp",
        )
        .filter(F.col("lcp") >= min_lcp)
        .groupBy("id_a", "id_b")
        .agg(
            F.max("lcp").alias("max_lcp"),
            F.count("*").cast("long").alias("n_adj"),
        )
    )


def dup_profile(
    docs: DataFrame,
    min_lcp: int = 20,
    max_chars: int = 48,
    lcp_cap: int = 32,
    text_col: str = "text",
    base: int = 8,
    method: str = "direct",
) -> DataFrame:
    """Per-document duplication profile → (doc_id, n_pos, n_dup): of the
    document's suffix positions, how many start a substring of ≥
    ``min_lcp`` chars that ALSO OCCURS ELSEWHERE in the corpus (any
    other (doc, pos), same doc included — Lee et al. 2022's
    duplicated-fraction statistic, the signal behind "drop documents
    that are mostly duplicated text"). For SA position i the longest
    match elsewhere is exactly max(lcp(i−1, i), lcp(i, i+1)) — the
    classic SA neighbor property — so the whole profile is two shifted
    equi-joins and one aggregate on top of the suffix array."""
    sa = suffix_array(
        docs, max_chars=max_chars, text_col=text_col, base=base, method=method
    )
    cur = sa.select(
        F.col("sa").alias("i"), "doc_id", F.col("s").alias("s0")
    )
    nxt = sa.select((F.col("sa") - 1).alias("i"), F.col("s").alias("sn"))
    prv = sa.select((F.col("sa") + 1).alias("i"), F.col("s").alias("sp"))
    j = cur.join(nxt, "i", "left").join(prv, "i", "left")
    j = with_lcp(j.fillna({"sn": "", "sp": ""}), "s0", "sn", lcp_cap, "ln")
    j = with_lcp(j, "s0", "sp", lcp_cap, "lp")
    dup = F.greatest("ln", "lp") >= min_lcp
    return j.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_pos"),
        F.sum(dup.cast("long")).alias("n_dup"),
    )
