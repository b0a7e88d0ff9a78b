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
