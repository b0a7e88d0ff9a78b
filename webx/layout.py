"""Data-layout keys — Z-order (Morton) interleaving for multi-dim file
clustering.

At 100 TB the scan you never do is the cheapest operator: engines skip
parquet files whose min/max stats exclude the predicate, and min/max
stats are only tight when rows with nearby values are physically
together. Sorting by one column makes ONE predicate skippable; Z-order
interleaves the bits of two columns so files are tight on BOTH — the
``OPTIMIZE … ZORDER BY`` of Delta/Iceberg, implemented here as a plain
deterministic column + ``repartitionByRange`` so it works on any sink.

``zorder_key`` avoids left-shifting data bits entirely: each input bit
is extracted with a right-shift and multiplied by a literal power of
two — no sign-bit or overflow edge in either Spark or the DuckDB
oracle, bit-identical across engines. Inputs are clamped to
``bits`` ≤ 31 low bits (62-bit result in a signed 64-bit long).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def zorder_key(a, b, bits: int = 31) -> Column:
    """Morton interleave of the low ``bits`` bits of integer columns
    ``a`` (even positions) and ``b`` (odd positions) → non-negative
    BIGINT. Values are masked to ``bits`` first (callers bucket/scale
    wider domains down; rank-based normalization is the production
    recipe for arbitrary distributions)."""
    if not 1 <= bits <= 31:
        raise ValueError("bits must be in 1..31")
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    mask = (1 << bits) - 1
    a = a.cast("long").bitwiseAND(F.lit(mask))
    b = b.cast("long").bitwiseAND(F.lit(mask))
    terms = []
    for i in range(bits):
        bit_a = F.shiftright(a, i).bitwiseAND(F.lit(1))
        bit_b = F.shiftright(b, i).bitwiseAND(F.lit(1))
        terms.append(bit_a * F.lit(1 << (2 * i)))
        terms.append(bit_b * F.lit(1 << (2 * i + 1)))
    z = terms[0]
    for t in terms[1:]:
        z = z + t
    return z


def zorder_key_sql(a_expr: str, b_expr: str, bits: int = 31) -> str:
    """DuckDB mirror of :func:`zorder_key` — identical extract-and-
    multiply arithmetic, so the oracle recomputes keys bit-for-bit."""
    if not 1 <= bits <= 31:
        raise ValueError("bits must be in 1..31")
    mask = (1 << bits) - 1
    a = f"(CAST({a_expr} AS BIGINT) & {mask})"
    b = f"(CAST({b_expr} AS BIGINT) & {mask})"
    terms = []
    for i in range(bits):
        terms.append(f"((({a} >> {i}) & 1) * {1 << (2 * i)})")
        terms.append(f"((({b} >> {i}) & 1) * {1 << (2 * i + 1)})")
    return "(" + " + ".join(terms) + ")"


def cluster_by_zorder(
    df: DataFrame,
    a: str,
    b: str,
    num_files: int,
    bits: int = 31,
    key_col: str = "_zorder",
) -> DataFrame:
    """Physically cluster ``df`` for a multi-dim-filterable layout:
    range-partition on the Morton key into ``num_files`` buckets and
    sort within each — one range exchange (sampled boundaries), then
    each output file's min/max stats are tight on BOTH ``a`` and ``b``.
    Write the result with any file sink; drop ``key_col`` afterwards if
    the key itself is not wanted."""
    keyed = df.withColumn(key_col, zorder_key(a, b, bits))
    return keyed.repartitionByRange(num_files, key_col).sortWithinPartitions(
        key_col
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int,
    sort_by: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` hash-bucketed on ``key`` (``bucketBy`` +
    ``saveAsTable``): each bucket file holds exactly the keys that hash
    to it, so a later equi-join or aggregation between two tables
    bucketed the SAME way runs with ZERO exchange — the shuffle is
    paid once at write time, then amortized over every downstream join
    (the co-located-join recipe for fact-fact joins at 100 TB, and the
    parquet-table analog of Iceberg's bucket partition transform).
    ``sort_by`` additionally pre-sorts within buckets, upgrading those
    joins to merge-without-sort."""
    w = df.write.format("parquet").mode(mode)
    w = w.bucketBy(n_buckets, key)
    if sort_by:
        w = w.sortBy(sort_by)
    w.saveAsTable(table)


def read_bucketed(spark, table: str) -> DataFrame:
    """Read a :func:`write_bucketed` table with bucketing metadata
    intact (plain ``spark.table`` — the catalog carries the bucket
    spec; reading the files directly would silently drop it and
    re-introduce the shuffle)."""
    return spark.table(table)


def pruning_report(path: str, column: str, lo, hi) -> dict:
    """Measure data-skipping potential from REAL parquet footers: for a
    predicate ``column BETWEEN lo AND hi``, a file whose [min, max]
    stats exclude the range is never opened by the scan. Returns
    {n_files, n_skipped, skip_fraction}. This is the observable the
    layout operators exist to move: after ``cluster_by_zorder`` /
    sort-on-write, skip_fraction for selective predicates approaches
    (1 − selectivity); a hash-scattered layout pins it at 0 because
    every file spans the whole domain. Files without stats count as
    unskippable (the engines' conservative behavior)."""
    import os

    import pyarrow.parquet as pq

    files = [
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".parquet")
    ]
    n_skipped = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        idx = None
        for i in range(md.num_columns):
            if md.schema.column(i).name == column:
                idx = i
                break
        if idx is None:
            raise ValueError(f"column {column!r} not in {f}")
        fmin = fmax = None
        have = True
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                have = False
                break
            fmin = st.min if fmin is None else min(fmin, st.min)
            fmax = st.max if fmax is None else max(fmax, st.max)
        if have and fmin is not None and (fmax < lo or fmin > hi):
            n_skipped += 1
    return {
        "n_files": len(files),
        "n_skipped": n_skipped,
        "skip_fraction": (n_skipped / len(files)) if files else 0.0,
    }
