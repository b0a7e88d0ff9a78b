"""CDXJ capture-index source lane — the crawl-planning input format.

A web archive's CDX(J) index is one line per capture::

    com,example)/path 20240101000000 {"url": "https://example.com/path",
        "mime": "text/html", "status": "200", "digest": "…",
        "length": "1234", "offset": "5678", "filename": "….warc.gz"}

(SURT-ordered key, 14-digit UTC timestamp, JSON blob — numbers are
strings in the wild). A recrawl/extraction job plans its WARC range
reads from this index: filter to fetchable captures, pick the latest
per URL, and emit ``(filename, offset, length)`` pointers that drive
the byte-range fetch. This is a source *format* adapter in the same
sense as the reference's dataset classes (mindocr/data/det_dataset.py
reads one label layout and emits canonical rows): index bytes in,
canonical capture rows out.

All parsing is JVM codegen — ``split`` (limit 3, so JSON-internal
spaces survive) + ``from_json`` + ``try_to_timestamp`` — and fuses
into the index scan; at Common-Crawl scale (~10^10 index lines per
crawl) there is no Python and no shuffle until the per-URL latest
pick, which is ONE ``max_by`` hash aggregate moving 8-byte epochs and
pointer structs, never page bytes (same plan shape as
``q_latest_capture``, PLANS.md round-3 notes). Malformed lines and
unparseable timestamps yield NULL fields, never task failures
(fail-soft like the feed/sitemap lane).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import StringType, StructField, StructType

__all__ = ["parse_cdx", "select_captures", "latest_captures"]

_CDX_JSON = StructType(
    [
        StructField(f, StringType())
        for f in ("url", "mime", "status", "digest", "length", "offset",
                  "filename")
    ]
)


def parse_cdx(lines: DataFrame, line_col: str = "line") -> DataFrame:
    """CDXJ lines → canonical capture rows ``(surt_key, capture_epoch,
    url, mime, status, digest, warc_filename, warc_offset,
    warc_length)``. Epoch from the 14-digit UTC timestamp
    (``try_to_timestamp`` — a malformed ts is NULL, not an error);
    offset/length via try_cast the same fail-soft way (ANSI cast raises)."""
    parts = F.split(F.col(line_col), " ", 3)
    j = F.from_json(parts[2], _CDX_JSON)
    return lines.select(
        parts[0].alias("surt_key"),
        F.unix_timestamp(
            F.try_to_timestamp(parts[1], F.lit("yyyyMMddHHmmss"))
        ).alias("capture_epoch"),
        j["url"].alias("url"),
        j["mime"].alias("mime"),
        j["status"].try_cast("int").alias("status"),
        j["digest"].alias("digest"),
        j["filename"].alias("warc_filename"),
        j["offset"].try_cast("bigint").alias("warc_offset"),
        j["length"].try_cast("bigint").alias("warc_length"),
    )


def select_captures(
    captures: DataFrame,
    statuses: tuple[int, ...] = (200,),
    mimes: tuple[str, ...] = ("text/html",),
) -> DataFrame:
    """Fetchability filter — predicate-pushdown-friendly plain columns
    (a parquet-backed index prunes on these at the scan)."""
    return captures.filter(
        F.col("status").isin(list(statuses))
        & F.col("mime").isin(list(mimes))
    )


def latest_captures(captures: DataFrame) -> DataFrame:
    """Latest capture per URL in ONE hash aggregate: ``max_by`` of the
    pointer struct keyed on ``(capture_epoch, digest)`` — the digest
    tiebreak makes re-runs deterministic when an archive holds two
    captures in the same second. Partial aggregation halves the
    exchange on typical recrawl duplication; no window sort, no
    join-back."""
    others = [c for c in captures.columns if c != "url"]
    agg = captures.groupBy("url").agg(
        F.max_by(
            F.struct(*others),
            F.struct(F.col("capture_epoch"), F.col("digest")),
        ).alias("w")
    )
    return agg.select("url", *[F.col(f"w.{c}").alias(c) for c in others])


def change_rate_schedule(
    captures: DataFrame,
    key_col: str = "doc_id",
    order_col: str = "cap_idx",
    body_col: str = "body",
    interval: float = 1.0,
) -> DataFrame:
    """Recrawl scheduling from capture history — the Cho &
    Garcia-Molina change-frequency estimator (TOIT 2003, public):
    given n+1 equally-spaced captures of a page (n adjacent
    comparisons, X of them showing a changed body), the naive X/(n·I)
    estimate is biased low for frequently-changing pages; the
    bias-corrected estimator is

        lambda_hat = -ln((n - X + 0.5) / (n + 0.5)) / I

    and the uniform-allocation revisit policy recrawls every
    1/lambda_hat intervals. Change detection is content-hash lag
    within each url's capture series (same one-window shape as the
    changed-captures filter); then one hash-agg per url. Scales as:
    one shuffle on the key for the window, partial+final agg on the
    same key (no second exchange), 8 bytes of hash per capture row.

    Output: (key, n_changes, change_rate, recrawl_days) — floats
    rounded to 6dp so the row is oracle-comparable. A page with zero
    observed changes gets change_rate exactly 0 (the estimator's
    closed form at X=0) and recrawl_days NULL — "never recrawl" —
    rather than an ANSI divide-by-zero (try_divide).
    """
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(order_col)
    h = F.xxhash64(body_col)
    changed = (
        captures.select(
            key_col, F.lag(h).over(w).alias("_prev"), h.alias("_h")
        )
        .withColumn(
            "_chg",
            F.when(
                F.col("_prev").isNotNull() & (F.col("_h") != F.col("_prev")), 1
            ).otherwise(0),
        )
        .groupBy(key_col)
        .agg(
            F.sum("_chg").alias("n_changes"),
            (F.count("*") - 1).alias("_n"),
        )
    )
    lam = -F.log(
        (F.col("_n") - F.col("n_changes") + 0.5) / (F.col("_n") + 0.5)
    ) / F.lit(interval)
    return changed.select(
        key_col,
        "n_changes",
        F.round(lam, 6).alias("change_rate"),
        F.round(F.try_divide(F.lit(1.0), lam), 6).alias("recrawl_days"),
    )
