"""URL operators for crawl pipelines — pure column expressions.

Canonicalization is the key-discipline primitive for everything keyed by
url (dedup, partitioning, politeness): the formulas are frozen
regexp/string expressions so a SQL oracle reproduces them exactly, and
they run entirely in whole-stage codegen (no Python).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_SCHEME_HOST = r"^([a-zA-Z][a-zA-Z0-9+.-]*)://([^/?#]*)"


def host(url: Column | str) -> Column:
    """Lower-cased host (authority without port/userinfo)."""
    h = F.lower(F.regexp_extract(url, _SCHEME_HOST, 2))
    h = F.regexp_replace(h, r"^[^@]*@", "")   # strip userinfo
    return F.regexp_replace(h, r":\d+$", "")  # strip port


def normalize_url(url: Column | str) -> Column:
    """Deterministic canonical form:

    1. strip the fragment;
    2. lower-case scheme and authority;
    3. drop default ports (:80 http, :443 https);
    4. drop a bare trailing slash on an empty path.
    """
    u = F.regexp_replace(url, r"#.*$", "")
    scheme = F.lower(F.regexp_extract(u, _SCHEME_HOST, 1))
    auth = F.lower(F.regexp_extract(u, _SCHEME_HOST, 2))
    rest = F.regexp_replace(u, _SCHEME_HOST, "")
    auth = F.when(
        (scheme == "http") & auth.endswith(":80"),
        F.regexp_replace(auth, r":80$", ""),
    ).when(
        (scheme == "https") & auth.endswith(":443"),
        F.regexp_replace(auth, r":443$", ""),
    ).otherwise(auth)
    rest = F.when(rest == "/", F.lit("")).otherwise(rest)
    return F.when(
        F.regexp_extract(u, _SCHEME_HOST, 1) == "", u  # not scheme://host shaped
    ).otherwise(F.concat(scheme, F.lit("://"), auth, rest))


def path_depth(url: Column | str) -> Column:
    """Number of non-empty path segments."""
    path = F.regexp_replace(
        F.regexp_replace(url, _SCHEME_HOST, ""), r"[?#].*$", ""
    )
    return F.size(F.filter(F.split(path, "/"), lambda s: s != ""))


def tld(url: Column | str) -> Column:
    """Last dot-label of the host (naive TLD — a public-suffix list is a
    broadcast-table upgrade)."""
    return F.regexp_extract(host(url), r"\.([^.]+)$", 1)


def with_url_features(df: DataFrame, url_col: str = "url") -> DataFrame:
    return df.select(
        "*",
        host(url_col).alias("url_host"),
        normalize_url(url_col).alias("url_norm"),
        path_depth(url_col).alias("url_depth"),
        tld(url_col).alias("url_tld"),
    )
