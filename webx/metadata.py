"""Structured page metadata — the schema.org / OpenGraph / outline layer.

The reference's label pipeline attaches typed metadata to every sample
(mindocr's det/rec label files carry per-image transcription + polygon
records next to the raw bytes); a web corpus's equivalent is the machine-
readable metadata publishers embed in the page itself: OpenGraph
``<meta property="og:*">`` tags, JSON-LD ``<script type="application/
ld+json">`` blocks, the heading outline, and ``<table>`` grids. All four
extractors here are pure JVM codegen (regexp + from_json + explode) over
the shared lossy UTF-8 decode — zero Python, zero shuffle, fused into
any stage that already scans ``html``. At crawl scale these are the
projections a metadata index is built from, so they must not cost a
second pass over the bytes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F, types as T

from webx.urls import _lossy_utf8

# Attribute order varies in the wild: property-first and content-first
# forms are both extracted and coalesced. Values are double- or
# single-quoted; [^"']* keeps the match inside one attribute.
_OG_PROP_FIRST = (
    '(?is)<meta[^>]*property=["\']og:{name}["\'][^>]*content=["\']([^"\']*)["\']'
)
_OG_CONTENT_FIRST = (
    '(?is)<meta[^>]*content=["\']([^"\']*)["\'][^>]*property=["\']og:{name}["\']'
)


def _og(txt: Column, name: str) -> Column:
    a = F.regexp_extract(txt, _OG_PROP_FIRST.format(name=name), 1)
    b = F.regexp_extract(txt, _OG_CONTENT_FIRST.format(name=name), 1)
    return F.when(a != "", a).otherwise(b)


_JSONLD_RE = (
    '(?is)<script[^>]*type=["\']application/ld\\+json["\'][^>]*>(.*?)</script>'
)
_JSONLD_SCHEMA = T.StructType(
    [
        T.StructField("@type", T.StringType()),
        T.StructField("headline", T.StringType()),
        T.StructField("datePublished", T.StringType()),
        T.StructField("author", T.StructType([T.StructField("name", T.StringType())])),
    ]
)


def structured_meta(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """OpenGraph + first JSON-LD block as typed columns.

    ``og_title`` / ``og_type`` from ``<meta property="og:*">`` (either
    attribute order, either quote style); ``jsonld_type`` / ``jsonld_headline``
    / ``jsonld_author`` from the FIRST ``application/ld+json`` script,
    parsed with ``from_json`` against a typed schema (malformed JSON →
    NULL struct, never a task failure — fail-soft like every scan-side
    operator here). Missing tags yield '' so downstream group-bys never
    mix NULL semantics."""
    txt = _lossy_utf8(html_col)
    block = F.regexp_extract(txt, _JSONLD_RE, 1)
    parsed = F.from_json(block, _JSONLD_SCHEMA)
    return pages.select(
        "*",
        F.coalesce(_og(txt, "title"), F.lit("")).alias("og_title"),
        F.coalesce(_og(txt, "type"), F.lit("")).alias("og_type"),
        F.coalesce(parsed["@type"], F.lit("")).alias("jsonld_type"),
        F.coalesce(parsed["headline"], F.lit("")).alias("jsonld_headline"),
        F.coalesce(parsed["author"]["name"], F.lit("")).alias("jsonld_author"),
    )


# --- publication-date fallback chain ------------------------------------
# The lane order every crawl-dating pipeline converges on (htmldate /
# trafilatura discipline — public): explicit editorial metadata first,
# then markup, then the URL path. A lane contributes only if its value
# actually contains an ISO calendar date, so a malformed high-priority
# lane falls through instead of blanking the row.
_META_PUB_PROP_FIRST = (
    '(?is)<meta[^>]*property=["\']article:published_time["\']'
    '[^>]*content=["\']([^"\']*)["\']'
)
_META_PUB_CONTENT_FIRST = (
    '(?is)<meta[^>]*content=["\']([^"\']*)["\']'
    '[^>]*property=["\']article:published_time["\']'
)
_TIME_DATETIME_RE = '(?is)<time[^>]*datetime=["\']([^"\']*)["\']'
_ISO_DATE_RE = "((?:19|20)\\d{2}-\\d{2}-\\d{2})"
_URL_DATE_RE = "/((?:19|20)\\d{2})/(\\d{1,2})/(\\d{1,2})(?:/|$)"


def publish_dates(
    pages: DataFrame, html_col: str = "html", url_col: str = "url"
) -> DataFrame:
    """Publication date per page → ``publish_date`` ('yyyy-MM-dd' or '')
    and ``publish_date_source`` ('meta' | 'jsonld' | 'time' | 'url' | '').

    Fallback chain: ``<meta property="article:published_time">`` (either
    attribute order) → JSON-LD ``datePublished`` → ``<time datetime>`` →
    a /YYYY/MM/DD/ URL path segment. Each lane is validated to contain an
    ISO calendar date before it wins, so malformed values fall through.
    Pure JVM codegen (regexp + from_json) over the shared lossy decode —
    zero Python, zero shuffle, fused into any stage scanning ``html``."""
    txt = _lossy_utf8(html_col)
    iso = lambda c: F.regexp_extract(c, _ISO_DATE_RE, 1)  # noqa: E731
    meta_a = F.regexp_extract(txt, _META_PUB_PROP_FIRST, 1)
    meta_b = F.regexp_extract(txt, _META_PUB_CONTENT_FIRST, 1)
    meta_d = iso(F.when(meta_a != "", meta_a).otherwise(meta_b))
    jsonld = F.from_json(F.regexp_extract(txt, _JSONLD_RE, 1), _JSONLD_SCHEMA)
    jsonld_d = iso(F.coalesce(jsonld["datePublished"], F.lit("")))
    time_d = iso(F.regexp_extract(txt, _TIME_DATETIME_RE, 1))
    u = F.col(url_col)
    y = F.regexp_extract(u, _URL_DATE_RE, 1)
    url_d = F.when(
        y != "",
        F.concat_ws(
            "-",
            y,
            F.lpad(F.regexp_extract(u, _URL_DATE_RE, 2), 2, "0"),
            F.lpad(F.regexp_extract(u, _URL_DATE_RE, 3), 2, "0"),
        ),
    ).otherwise(F.lit(""))
    date = (
        F.when(meta_d != "", meta_d)
        .when(jsonld_d != "", jsonld_d)
        .when(time_d != "", time_d)
        .otherwise(url_d)
    )
    source = (
        F.when(meta_d != "", F.lit("meta"))
        .when(jsonld_d != "", F.lit("jsonld"))
        .when(time_d != "", F.lit("time"))
        .when(url_d != "", F.lit("url"))
        .otherwise(F.lit(""))
    )
    return pages.select(
        "*", date.alias("publish_date"), source.alias("publish_date_source")
    )


# Backreference \1 pairs the close tag with its open level — Spark regex
# is java.util.regex (backrefs supported; this is NOT in the RE2 subset,
# so the DuckDB oracle states expectations closed-form instead of
# mirroring the pattern).
_HEADING_RE = "(?is)<h([1-6])[^>]*>(.*?)</h\\1>"
_STRIP_TAGS = "(?s)<[^>]*>"
_WS = "[ \\t\\r\\n\\f\\x0B]+"


# <pre>…</pre> with an optional inner <code> wrapper; content captured
# RAW — code corpora need the bytes verbatim, not the text lane's
# whitespace collapse
_PRE_RE = (
    "(?is)<pre([^>]*)>\\s*(?:<code([^>]*)>)?(.*?)(?:</code>\\s*)?</pre>"
)
_CLASS_LANG_RE = r"""(?i)\bclass\s*=\s*["'][^"']*\blang(?:uage)?-([\w#+.-]+)"""


def _decode_basic_entities(c: Column) -> Column:
    """The five entities markup MUST escape inside code blocks; decoded
    in amp-last order so '&amp;lt;' round-trips to '&lt;' not '<'."""
    for ent, ch in (
        ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&#39;", "'"),
        ("&amp;", "&"),
    ):
        c = F.replace(c, F.lit(ent), F.lit(ch))
    return c


def code_blocks(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """Code-corpus mining (The-Stack/StarCoder-style sources from web
    pages): one row per ``<pre>`` block — ``(url, block_idx, lang_hint,
    code, n_lines)``. The semantic OPPOSITE of the text lane: internal
    whitespace (indentation, newlines) is the signal and is preserved
    verbatim; only the leading/trailing newline the markup convention
    adds is trimmed. ``lang_hint`` comes from ``class="language-x"`` /
    ``lang-x`` on the pre or inner code tag ('' when undeclared);
    the five mandatory entities decode. Pure codegen, one explode."""
    txt = _lossy_utf8(html_col)
    pat = F.lit(_PRE_RE)
    trips = F.arrays_zip(
        F.regexp_extract_all(txt, pat, 1).alias("pre_attrs"),
        F.regexp_extract_all(txt, pat, 2).alias("code_attrs"),
        F.regexp_extract_all(txt, pat, 3).alias("raw"),
    )
    out = pages.select("url", F.posexplode(trips).alias("block_idx", "t"))
    lang = F.when(
        F.regexp_extract("t.code_attrs", _CLASS_LANG_RE, 1) != "",
        F.regexp_extract("t.code_attrs", _CLASS_LANG_RE, 1),
    ).otherwise(F.regexp_extract("t.pre_attrs", _CLASS_LANG_RE, 1))
    code = _decode_basic_entities(
        F.regexp_replace(
            F.regexp_replace(F.col("t.raw"), r"^\r?\n", ""), r"\r?\n[ \t]*$", ""
        )
    )
    return out.select(
        "url",
        "block_idx",
        F.lower(lang).alias("lang_hint"),
        code.alias("code"),
        (F.size(F.split(code, "\n", -1))).alias("n_lines"),
    ).filter(F.col("code") != "")


_MATHML_RE = "(?is)<math\\b([^>]*)>(.*?)</math>"
_ALTTEXT_RE = r"""(?i)\balttext\s*=\s*["']([^"']*)["']"""
_TEX_DISPLAY_RE = r"(?s)\$\$(.+?)\$\$"
_TEX_INLINE_RE = r"(?s)\\\((.+?)\\\)"
_TEX_BRACKET_RE = r"(?s)\\\[(.+?)\\\]"


def math_spans(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """Math-aware extraction (the OpenWebMath motivation: generic text
    extractors destroy equations): one row per math occurrence —
    ``(url, kind ∈ {mathml, display, inline, bracket}, idx, math,
    alttext)`` with the math source VERBATIM (MathML inner XML; TeX
    between ``$$…$$`` / ``\\(…\\)`` / ``\\[…\\]``), whitespace
    untouched. ``idx`` orders within each kind (document order per
    pattern pass); ``alttext`` is MathML's declared TeX fallback (''
    elsewhere). Pure codegen: four regexp_extract_all passes fused into
    one scan stage, one explode."""
    txt = _lossy_utf8(html_col)

    def lane(pat: str, kind: str, grp_attrs: bool) -> DataFrame:
        if grp_attrs:
            pairs = F.arrays_zip(
                F.regexp_extract_all(txt, F.lit(pat), 1).alias("attrs"),
                F.regexp_extract_all(txt, F.lit(pat), 2).alias("m"),
            )
            out = pages.select("url", F.posexplode(pairs).alias("idx", "t"))
            return out.select(
                "url", F.lit(kind).alias("kind"), "idx",
                F.col("t.m").alias("math"),
                F.regexp_extract("t.attrs", _ALTTEXT_RE, 1).alias("alttext"),
            )
        hits = F.regexp_extract_all(txt, F.lit(pat), 1)
        out = pages.select("url", F.posexplode(hits).alias("idx", "math"))
        return out.select(
            "url", F.lit(kind).alias("kind"), "idx", "math",
            F.lit("").alias("alttext"),
        )

    res = lane(_MATHML_RE, "mathml", True)
    for pat, kind in (
        (_TEX_DISPLAY_RE, "display"),
        (_TEX_INLINE_RE, "inline"),
        (_TEX_BRACKET_RE, "bracket"),
    ):
        res = res.unionByName(lane(pat, kind, False))
    return res.filter(F.trim(F.col("math")) != "")


_TAGNAME_RE = r"(?i)</?([a-zA-Z][a-zA-Z0-9]*)"


def template_fingerprint(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """DOM-shape fingerprint: ``template_fp`` = xxhash64 of the page's
    lower-cased tag-name sequence (open and close tags, document
    order), ``n_tags`` its length. Pages rendered from one template
    share the fingerprint regardless of content, so a host's pages
    cluster into their template families — the page-template detection
    signal boilerplate research groups on (and a cheap prefilter
    before per-template boilerplate induction). Pure codegen: one
    regexp_extract_all + transform + xxhash64, no shuffle."""
    txt = _lossy_utf8(html_col)
    tags = F.regexp_extract_all(txt, F.lit(_TAGNAME_RE), 1)
    seq = F.array_join(F.transform(tags, F.lower), ",")
    return pages.select(
        "*",
        F.xxhash64(seq).alias("template_fp"),
        F.size(tags).alias("n_tags"),
    )


def _clean_fragment(c: Column) -> Column:
    """Inner-HTML fragment → visible text: drop tags, collapse whitespace."""
    return F.trim(F.regexp_replace(F.regexp_replace(c, _STRIP_TAGS, " "), _WS, " "))


def heading_outline(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """Document heading outline: one row per ``<h1>``–``<h6>`` in
    document order — ``(…, pos, level, heading)``. The outline is the
    section structure a chunking/TOC stage keys on (the analog of the
    reference's reading-order ``sorted_boxes``: structure recovered as
    an ordered sequence). Two ``regexp_extract_all`` over the same
    pattern (level group, text group) zipped then ``posexplode`` —
    order is match order, deterministic."""
    txt = _lossy_utf8(html_col)
    levels = F.regexp_extract_all(txt, F.lit(_HEADING_RE), 1)
    texts = F.regexp_extract_all(txt, F.lit(_HEADING_RE), 2)
    zipped = F.arrays_zip(levels.alias("lvl"), texts.alias("h"))
    out = pages.select("*", F.posexplode(zipped).alias("pos", "z"))
    return out.select(
        *pages.columns,
        "pos",
        F.col("z.lvl").cast("int").alias("level"),
        _clean_fragment(F.col("z.h")).alias("heading"),
    )


_TR_RE = "(?is)<tr[^>]*>(.*?)</tr>"
_CELL_RE = "(?is)<t([dh])[^>]*>(.*?)</t\\1>"


def html_tables(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """``<table>`` grids → one row per cell:
    ``(…, row_idx, col_idx, is_header, cell)``.

    Web tables are the densest structured payload in a crawl (the wiki
    /product-spec tables training sets mine). Row split and cell split
    are nested ``regexp_extract_all`` + ``posexplode`` — all JVM, no
    Python. Cells are tag-stripped and whitespace-normalized. Nested
    tables: inner rows surface as their own rows (flat scan semantics,
    the same policy as the anchor extractor). For exact nesting,
    implicit closures, charset-aware decode and the data/layout
    classifier, use the exact lane: ``webx.tables.run_table_extraction``."""
    txt = _lossy_utf8(html_col)
    rows = F.regexp_extract_all(txt, F.lit(_TR_RE), 1)
    with_rows = pages.select("*", F.posexplode(rows).alias("row_idx", "row_html"))
    kinds = F.regexp_extract_all("row_html", F.lit(_CELL_RE), 1)
    cells = F.regexp_extract_all("row_html", F.lit(_CELL_RE), 2)
    zipped = F.arrays_zip(kinds.alias("k"), cells.alias("c"))
    out = with_rows.select(
        *pages.columns, "row_idx", F.posexplode(zipped).alias("col_idx", "z")
    )
    return out.select(
        *pages.columns,
        "row_idx",
        "col_idx",
        (F.col("z.k") == "h").cast("int").alias("is_header"),
        _clean_fragment(F.col("z.c")).alias("cell"),
    )


# HTML void elements never receive a close tag; counting their opens
# into depth would skew every page that uses <br>/<img>/<meta>.
_VOID = [
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr",
]
_TAG_TOKEN_RE = "</?[a-zA-Z][a-zA-Z0-9]*[^>]*>"
_SCRIPT_STYLE_RE = "(?is)<(script|style)[^>]*>.*?</\\1>"


def dom_depth_stats(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """Max DOM nesting depth + open-tag count per page — the structural
    complexity profile (template-detection features; pathological-page
    guard before a real parser). Script/style bodies are removed first
    (their text is not markup), then a single JVM ``aggregate`` over the
    tag-token array runs the open/close counter — O(tags), no Python,
    no shuffle. Policy: void and self-closed elements don't nest;
    stray close tags clamp at zero (forgiving, like browser parsers)."""
    txt = F.regexp_replace(_lossy_utf8(html_col), _SCRIPT_STYLE_RE, " ")
    toks = F.regexp_extract_all(txt, F.lit(_TAG_TOKEN_RE), 0)

    def _classify(t: Column) -> Column:
        return F.struct(
            t.startswith("</").alias("close"),
            F.lower(
                F.regexp_extract(t, "^</?([a-zA-Z][a-zA-Z0-9]*)", 1)
            ).alias("name"),
            t.endswith("/>").alias("selfclosed"),
        )

    nesting = F.filter(
        F.transform(toks, _classify),
        lambda s: ~s["name"].isin(_VOID) & ~s["selfclosed"],
    )
    zero = F.lit(0).cast("int")
    agg = F.aggregate(
        nesting,
        F.struct(zero.alias("depth"), zero.alias("maxd"), zero.alias("opens")),
        lambda acc, s: F.struct(
            F.when(s["close"], F.greatest(acc["depth"] - 1, F.lit(0)))
            .otherwise(acc["depth"] + 1)
            .alias("depth"),
            F.when(s["close"], acc["maxd"])
            .otherwise(F.greatest(acc["maxd"], acc["depth"] + 1))
            .alias("maxd"),
            (acc["opens"] + F.when(s["close"], 0).otherwise(1)).alias("opens"),
        ),
    )
    return pages.select(
        "*",
        F.size(toks).alias("n_tag_tokens"),
        agg["maxd"].alias("max_depth"),
        agg["opens"].alias("n_open_tags"),
    )
