"""Temporal / interval join operators Spark lacks as primitives.

Two classics of event-stream and lookup-table analytics, each written
as the shape that survives 100× scale:

* **as-of join** (``asof_join``): for every left row, the single right
  row with the greatest ``ts`` ≤ left ``ts`` within the same key — the
  point-in-time lookup behind "latest capture before this event",
  trade-vs-quote matching, and slowly-changing-dimension resolution.
  The naive formulation (range join + per-left-row max) explodes into
  an O(n·m) non-equi join; Spark has no ASOF JOIN operator (DuckDB and
  Pandas ``merge_asof`` do). The scale formulation here is the
  union-tag sort: tag both sides, union, ONE shuffle on the key, and a
  running ``last(payload, ignorenulls)`` window carries each right row
  forward to the left rows that follow it in (ts, tag) order. Cost is
  a single hash exchange + per-key sort — the same price as any keyed
  window — and never materializes candidate pairs.

* **bucketed range join** (``range_join_bucketed``): join a value
  column into an interval table ``[lo, hi)``. Spark plans a plain
  ``v >= lo AND v < hi`` predicate as BroadcastNestedLoopJoin — fine
  for a handful of bands, O(rows × intervals) when the interval table
  grows (IP→geo tables run 10^6+ ranges). The standard fix: quantize
  both sides to width-``w`` buckets, EXPLODE each interval into the
  buckets it covers, equi-join on the bucket key (hash join, prunable,
  AQE-skew-splittable), then re-check the precise predicate. Fan-out
  is bounded by ceil(span/w) per interval.

Reference analog: the det→rec stage hand-off matches detected regions
to recognized text by position/order (mindocr
tools/infer/text/predict_system.py:131-143 zips det boxes with rec
results); these operators generalize that "match by ordering key, not
equality" idea to time and numeric ranges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_payload: tuple = (),
    direction: str = "backward",
) -> DataFrame:
    """For each left row: columns of ``left`` plus ``right_payload``
    columns from the right row with the greatest ``right_ts`` ≤ the
    left row's ``left_ts`` within the same ``key`` (NULLs if none) —
    semantics of DuckDB ``ASOF LEFT JOIN`` / pandas ``merge_asof``.

    Right rows must be unique per (key, ts); pre-collapse with
    ``max_by`` if not (q_latest_capture's shape). The right payload is
    carried as ONE struct so a NULL inside a payload column never
    leaks an older row's value into a newer match.

    Plan: union-tag → one Exchange on ``key`` → running ``last``
    window. Skewed keys (a mega-user) serialize within their key, same
    as any keyed window; salt the key upstream if a single key exceeds
    a task (webx/pipeline.py's mega-host treatment).
    """
    if direction != "backward":
        raise ValueError("only direction='backward' is implemented")
    payload = list(right_payload) or [
        c for c in right.columns if c not in (key, right_ts)
    ]
    l_tag = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_is_left"),
        F.struct(*left.columns).alias("_l"),
        F.lit(None).cast(
            right.select(F.struct(*payload).alias("s")).schema["s"].dataType
        ).alias("_r"),
    )
    r_tag = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        F.lit(None).cast(
            left.select(F.struct(*left.columns).alias("s")).schema["s"].dataType
        ).alias("_l"),
        F.struct(*payload).alias("_r"),
    )
    # right sorts BEFORE left at equal ts (_is_left 0 < 1): ties match,
    # the ASOF "ts >= right ts" contract.
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_is_left")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = (
        l_tag.unionByName(r_tag)
        .withColumn("_match", F.last("_r", ignorenulls=True).over(w))
        .filter(F.col("_is_left") == 1)
    )
    out = carried.select(
        *[F.col(f"_l.{c}").alias(c) for c in left.columns],
        *[F.col(f"_match.{c}").alias(c) for c in payload],
    )
    return out


def range_join_bucketed(
    df: DataFrame,
    intervals: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    bucket_width: float = 1.0,
) -> DataFrame:
    """Join rows of ``df`` to every interval ``[lo, hi)`` of
    ``intervals`` containing ``value_col``. Inner join; overlapping
    intervals yield one output row per match.

    The interval side explodes to one row per covered width-``w``
    bucket (``floor(lo/w) … floor((hi-ε)/w)``, via the half-open
    ceiling), the value side maps to ``floor(v/w)``; the join is a
    plain equi hash join on the bucket plus the exact containment
    re-check. Pick ``bucket_width`` near the median interval span so
    fan-out stays O(1) per interval.
    """
    w = float(bucket_width)
    if w <= 0:
        raise ValueError("bucket_width must be positive")
    b_lo = F.floor(F.col(lo_col) / w).cast("long")
    # last bucket of the half-open interval: ceil(hi/w) - 1, but never
    # below the lo bucket (degenerate/empty intervals still emit one)
    b_hi = F.greatest(F.ceil(F.col(hi_col) / w).cast("long") - 1, b_lo)
    iv = intervals.withColumn(
        "_bucket", F.explode(F.sequence(b_lo, b_hi))
    )
    probe = df.withColumn("_bucket", F.floor(F.col(value_col) / w).cast("long"))
    joined = probe.join(iv, on="_bucket", how="inner").filter(
        (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col))
    )
    return joined.drop("_bucket")


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: every big-side row picks a deterministic
    salt bucket ``pmod(xxhash64(<all columns>), S)`` and the SMALL side
    replicates ×S so every (key, bucket) pair exists; the join key
    becomes (key, bucket), so a mega-key's rows spread across S tasks
    instead of serializing in one.

    The salt hashes the WHOLE row rather than using ``rand()`` —
    identical rows share a bucket (harmless: spread is what matters,
    not per-row perfection) and the same input always shuffles the
    same way, so checkpoint/resume and A/B runs see identical
    partitioning. ``rand()``-salted plans are not replayable.

    This is the manual fallback for engines/paths where AQE skew-join
    does not reach (AQE only splits SORT-MERGE partitions post-shuffle
    and needs runtime stats; a streaming stage or a forced broadcast
    miss gets nothing). ``how`` supports inner/left joins (the
    replicate-small trick preserves both).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how='inner'|'left'")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt_buckets))
    b = big.withColumn("_salt", salt)
    s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    out = b.join(s, [key, "_salt"], how)
    return out.drop("_salt")


def skew_report(
    df: DataFrame, key, top_n: int = 5
) -> DataFrame:
    """Key-distribution diagnosis before an expensive shuffle: per-key
    counts → the ``top_n`` heaviest keys with share-of-corpus and the
    ratio to the MEDIAN key's count. ratio_to_median ≳ the per-task
    row budget divided by the median is the "salt this join / split
    this key" signal (webx/pipeline.py mega-host handling,
    salted_join). One hash agg (collapses map-side) + a tiny
    aggregate-of-aggregates; nothing returns at corpus scale except
    top_n rows."""
    key_col = F.col(key) if isinstance(key, str) else key
    counts = df.select(key_col.alias("key")).groupBy("key").agg(
        F.count("*").alias("n")
    )
    stats = counts.agg(
        F.percentile("n", 0.5).alias("median_n"),
        F.sum("n").alias("total_n"),
    )
    top = counts.orderBy(F.desc("n"), "key").limit(top_n)
    return top.crossJoin(F.broadcast(stats)).select(
        "key",
        "n",
        (F.col("n") / F.col("total_n")).alias("share"),
        (F.col("n") / F.col("median_n")).alias("ratio_to_median"),
    )


def bloom_filtered_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    m_bits: int = 1 << 20,
    k: int = 3,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with a Bloom RUNTIME FILTER: build a bloom bitmap of
    the small side's join keys (webx/sketch.py — m_bits/64 rows, one
    agg), broadcast it, and drop big-side rows whose keys cannot match
    BEFORE the join's exchange. When the join is selective (most
    big-side keys unmatched — the usual shape for "events ⋈ curated
    allowlist"), the shuffle moves only the surviving fraction plus the
    bloom's false positives; the join itself then discards those. Same
    rows as the plain join for inner/semi semantics. This is the
    manual form of the engine-side runtime-filter/DPP family, usable
    where Spark's own bloom join filter does not fire (non-AQE paths,
    pre-shuffle Python stages)."""
    if how not in ("inner", "left_semi"):
        raise ValueError("bloom prefilter preserves inner/left_semi joins only")
    from webx.sketch import bloom_build, bloom_probe

    bitmap = bloom_build(small.select(F.col(key)), key_col=key, m_bits=m_bits, k=k)
    maybe = bloom_probe(bitmap, big.select(key), key_col=key, m_bits=m_bits, k=k)
    keep = maybe.filter(F.col("maybe_seen")).select(key)
    pruned = big.join(F.broadcast(keep), key, "inner")
    return pruned.join(small, key, how)
