"""Syndication sources — RSS/Atom feeds and XML sitemaps.

A crawl pipeline discovers fresh URLs from two machine-readable surfaces
publishers maintain for exactly that purpose: syndication feeds (RSS 2.0
``<item>`` / Atom ``<entry>``) and ``sitemap.xml``. These are source
*formats* in the same sense as the reference's dataset adapters
(mindocr/data/det_dataset.py reads one label layout, LMDB another — same
canonical rows out): feed bytes in, canonical ``(feed_url, entry_idx,
title, link, pub_epoch)`` rows out.

Both parsers are pure JVM codegen (regexp_extract_all + posexplode +
to_timestamp) over the shared lossy UTF-8 decode — no Python, no
shuffle; at discovery scale (billions of feed fetches) they fuse into
the fetch-result scan. Date policy: Atom ``<updated>`` is ISO-8601;
RSS ``<pubDate>`` is RFC-822 whose day-of-week is OPTIONAL per spec —
the parser strips it (and the zone designator) before a fixed-pattern
parse, so both forms land on the same epoch column. Unparseable dates
→ NULL epoch, never a task failure.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from webx.urls import _lossy_utf8

_ENTRY_RE = "(?is)<(entry|item)[^>]*>(.*?)</\\1>"
_TITLE_RE = "(?is)<title[^>]*>(.*?)</title>"
_ATOM_LINK_RE = '(?is)<link[^>]*href=["\']([^"\']*)["\']'
_RSS_LINK_RE = "(?is)<link[^>]*>([^<]*)</link>"
_UPDATED_RE = "(?is)<updated[^>]*>([^<]*)</updated>"
_PUBDATE_RE = "(?is)<pubDate[^>]*>([^<]*)</pubDate>"
_WS = "[ \\t\\r\\n\\f\\x0B]+"


def _clean(c: Column) -> Column:
    return F.trim(F.regexp_replace(c, _WS, " "))


def _rfc822_epoch(raw: Column) -> Column:
    """RFC-822/1123 date → epoch seconds. Day-of-week (optional per spec)
    and the zone designator are stripped; 'GMT'/'UT'/'+0000' all mean
    UTC, which is the session timezone the pipeline pins."""
    stripped = F.regexp_replace(
        F.regexp_replace(raw, r"^\s*[A-Za-z]{3},\s*", ""),
        r"\s*(GMT|UTC?|Z|[+-]\d{4})\s*$",
        "",
    )
    # try_to_timestamp: Spark 4's to_timestamp RAISES on unparseable text
    # (CANNOT_PARSE_TIMESTAMP) — one malformed feed date must not fail a
    # billion-row discovery stage.
    return F.unix_timestamp(
        F.try_to_timestamp(F.trim(stripped), F.lit("dd MMM yyyy HH:mm:ss"))
    )


def _iso_epoch(raw: Column) -> Column:
    return F.unix_timestamp(
        F.try_to_timestamp(
            F.regexp_replace(F.trim(raw), "Z$", ""),
            F.lit("yyyy-MM-dd'T'HH:mm:ss"),
        )
    )


def parse_feed(feeds: DataFrame, xml_col: str = "xml") -> DataFrame:
    """Feed bytes → one row per entry:
    ``(…, source_format, entry_idx, title, link, pub_epoch)``.

    Format detection is per-document (``<feed`` root → atom, else rss),
    so a mixed fetch batch needs no pre-routing. Entry order is document
    order (``posexplode`` over the match array) — feeds are
    newest-first, and the index preserves that contract."""
    txt = _lossy_utf8(xml_col)
    kind = F.when(txt.rlike("(?is)<feed[\\s>]"), F.lit("atom")).otherwise(
        F.lit("rss")
    )
    blocks = F.regexp_extract_all(txt, F.lit(_ENTRY_RE), 2)
    out = feeds.select(
        "*",
        kind.alias("source_format"),
        F.posexplode(blocks).alias("entry_idx", "entry_xml"),
    )
    is_atom = F.col("source_format") == "atom"
    title = _clean(F.regexp_extract("entry_xml", _TITLE_RE, 1))
    link = F.when(
        is_atom, F.regexp_extract("entry_xml", _ATOM_LINK_RE, 1)
    ).otherwise(F.trim(F.regexp_extract("entry_xml", _RSS_LINK_RE, 1)))
    epoch = F.when(
        is_atom, _iso_epoch(F.regexp_extract("entry_xml", _UPDATED_RE, 1))
    ).otherwise(_rfc822_epoch(F.regexp_extract("entry_xml", _PUBDATE_RE, 1)))
    return out.select(
        *feeds.columns,
        "source_format",
        "entry_idx",
        title.alias("title"),
        link.alias("link"),
        epoch.alias("pub_epoch"),
    )


_URLBLOCK_RE = "(?is)<url>(.*?)</url>"
_LOC_RE = "(?is)<loc[^>]*>([^<]*)</loc>"
_LASTMOD_RE = "(?is)<lastmod[^>]*>([^<]*)</lastmod>"
_CHANGEFREQ_RE = "(?is)<changefreq[^>]*>([^<]*)</changefreq>"
_PRIORITY_RE = "(?is)<priority[^>]*>([^<]*)</priority>"


_SMBLOCK_RE = "(?is)<sitemap>(.*?)</sitemap>"


def sitemap_kind(xml_col: str = "xml") -> Column:
    """'index' | 'urlset' | 'unknown' — the sitemaps.org protocol has
    two document kinds and large hosts serve BOTH (an index of child
    sitemaps, each a urlset); a crawler must classify before parsing.
    Root-element test, case-insensitive, tolerant of the XML prolog and
    namespace attributes."""
    txt = _lossy_utf8(xml_col)
    return (
        F.when(txt.rlike("(?is)<\\s*sitemapindex[\\s>]"), F.lit("index"))
        .when(txt.rlike("(?is)<\\s*urlset[\\s>]"), F.lit("urlset"))
        .otherwise(F.lit("unknown"))
    )


def parse_sitemap_index(sitemaps: DataFrame, xml_col: str = "xml") -> DataFrame:
    """``<sitemapindex>`` → one row per child ``<sitemap>`` block:
    ``(…, sm_idx, loc, lastmod)`` — the discovery fan-out a crawler
    follows before fetching the child urlsets (then fed back through
    ``parse_sitemap``). Same codegen shape as parse_sitemap; rows from
    a non-index document are simply absent (no block matches)."""
    txt = _lossy_utf8(xml_col)
    blocks = F.regexp_extract_all(txt, F.lit(_SMBLOCK_RE), 1)
    out = sitemaps.select("*", F.posexplode(blocks).alias("sm_idx", "sm_xml"))
    return out.select(
        *sitemaps.columns,
        "sm_idx",
        F.trim(F.regexp_extract("sm_xml", _LOC_RE, 1)).alias("loc"),
        F.trim(F.regexp_extract("sm_xml", _LASTMOD_RE, 1)).alias("lastmod"),
    )


def parse_sitemap(sitemaps: DataFrame, xml_col: str = "xml") -> DataFrame:
    """``sitemap.xml`` urlset → one row per ``<url>`` block:
    ``(…, url_idx, loc, lastmod, changefreq, priority)``.

    ``lastmod``/``changefreq`` are '' when the block omits them (they
    are optional in the protocol); ``priority`` is NULL when omitted
    (its spec default 0.5 is a policy decision left to the frontier,
    not baked into the parser)."""
    txt = _lossy_utf8(xml_col)
    blocks = F.regexp_extract_all(txt, F.lit(_URLBLOCK_RE), 1)
    out = sitemaps.select(
        "*", F.posexplode(blocks).alias("url_idx", "url_xml")
    )
    prio_raw = F.trim(F.regexp_extract("url_xml", _PRIORITY_RE, 1))
    return out.select(
        *sitemaps.columns,
        "url_idx",
        F.trim(F.regexp_extract("url_xml", _LOC_RE, 1)).alias("loc"),
        F.trim(F.regexp_extract("url_xml", _LASTMOD_RE, 1)).alias("lastmod"),
        F.lower(
            F.trim(F.regexp_extract("url_xml", _CHANGEFREQ_RE, 1))
        ).alias("changefreq"),
        F.when(prio_raw != "", prio_raw.cast("double")).alias("priority"),
    )
