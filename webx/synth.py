"""Deterministic synthetic page generation — generate-input-from-expected-output.

The reference's system test synthesizes an input image *from known
texts+boxes* and then requires the pipeline to recover them
(tests/st/test_online_infer.py:18-75). We apply the same trick to HTML:
pages are built from the driver's ``documents`` parquet with JVM-side SQL
expressions only (concat/replace/encode — no Python in the synthesis path),
so the same pages can be produced at any scale, and the *expected* extracted
text / span offsets are closed-form functions of ``documents`` columns that
a SQL oracle (DuckDB) can compute independently.

Page anatomy (flagship): head(title+style+script) → header(logo+nav link
list) → comment → article(h1 + one content paragraph) → aside(link list) →
footer. Everything outside the article is boilerplate the detector must
drop; the article must survive byte-identically.

TEMPLATE PARTS ARE FROZEN — tests and the oracle arithmetic depend on the
exact byte lengths exported in ``template_constants()``.
"""

from __future__ import annotations

import unicodedata as _ud

from pyspark.sql import DataFrame, SparkSession, functions as F

# ---------------------------------------------------------------- template
# All parts are pure ASCII except P_TAIL (©), which sits after every offset
# the oracle needs, so char arithmetic == byte arithmetic for spans.

P_HEAD_UTF8 = '<!DOCTYPE html><html><head><meta charset="utf-8"><title>'
P_HEAD_LATIN1 = '<!DOCTYPE html><html><head><meta charset="iso-8859-1"><title>'
P_CHROME = (
    "</title>"
    "<style>body{font:14px/1.5 serif;color:#222}nav a{color:#06c}</style>"
    '<script>var t=1;if(t>0){console.log("x <b>not a tag</b>")}</script>'
    "</head><body>"
    '<header><div class="logo">Example Site</div>'
    '<nav><ul><li><a href="/">Home</a></li><li><a href="/products">Products</a></li>'
    '<li><a href="/pricing">Pricing</a></li><li><a href="/about">About us</a></li>'
    '<li><a href="/contact">Contact</a></li></ul></nav></header>'
    "<!-- begin content -->"
    "<article><h1>"
)
P_MID = "</h1><p>"
P_TAIL = (
    "</p></article>"
    '<aside><h3>Related</h3><ul><li><a href="/r/1">Related one</a></li>'
    '<li><a href="/r/2">Related two</a></li><li><a href="/r/3">Related three</a></li></ul></aside>'
    '<footer><p>© 2026 Example Corp. All rights reserved. '
    '<a href="/terms">Terms</a> · <a href="/privacy">Privacy</a></p></footer>'
    "</body></html>"
)
# link-farm divider between sections of the multi-article page: link
# density 1.0 → never a candidate → breaks the run merge.
P_AD = (
    '<div class="ad"><a href="/buy">Buy now</a> <a href="/offer">Special offer</a> '
    '<a href="/deal">Deal</a></div>'
)
P_MID2 = "</p></article><!-- ad -->" + P_AD + "<article><h2>Notes</h2><p>"
# Consent-modal + newsletter-strip page (q_extract_overlay): the modal
# paragraph is LONG, link-free and high-density — only the class/id-hint
# region logic (webx/tokenize.py NEG_CLASS_TOKENS) can drop it; the
# density gates alone would keep it. Expected text stays the flagship
# closed form, so the oracle is q_extract's.
P_MODAL = (
    '<div id="gdpr-modal" class="overlay"><section class="consent-dialog">'
    "<h2>Your privacy matters</h2>"
    "<p>We and our partners process personal data such as browsing behaviour "
    "and unique identifiers to deliver and measure advertising; you can "
    "withdraw consent at any time from the preferences page of this site.</p>"
    '<p><a href="#accept">Accept</a> <a href="#manage">Manage options</a></p>'
    "</section></div>"
)
P_STRIP = (
    '<div class="newsletter"><p>Get our headlines in your inbox every '
    'morning, completely free of charge.</p>'
    '<a href="/signup">Sign up now</a></div>'
)
_ARTICLE_OPEN = "<article><h1>"
_ARTICLE_CLOSE = "</p></article>"
assert P_CHROME.endswith(_ARTICLE_OPEN) and P_TAIL.startswith(_ARTICLE_CLOSE)
P_CHROME_MODAL = P_CHROME[: -len(_ARTICLE_OPEN)] + P_MODAL + _ARTICLE_OPEN
P_TAIL_STRIP = _ARTICLE_CLOSE + P_STRIP + P_TAIL[len(_ARTICLE_CLOSE) :]
# Raw-kept element page (q_extract_rawkept): an <xmp> markup sample
# inside the article. Per spec its content is literal text — tags shown,
# character references NOT decoded — so the expected line IS the source
# bytes (whitespace-normalized), a pure constant for the oracle.
XMP_SAMPLE = "Use <b>tags</b> &amp; entities literally, as written."
P_TAIL_XMP = (
    "</p><xmp>" + XMP_SAMPLE + "</xmp></article>" + P_TAIL[len(_ARTICLE_CLOSE) :]
)
# Non-prose drop-region page (q_extract_nonprose): a final paragraph
# mixing kept prose with inline svg (a11y title + label text), a ruby
# annotation, a select/option list and a button — all DROP regions
# whose text must vanish without breaking the surrounding sentence.
# The expected extra line is this pure constant:
NONPROSE_LINE = (
    "Quarterly rates fell to nine percent as the 東京 office reported "
    "this spring; pick a region and then confirm the filing window."
)
P_TAIL_NONPROSE = (
    "</p><p>Quarterly rates fell to "
    '<svg role="img" width="80" height="12"><title>rate sparkline</title>'
    '<desc>values 12 11 10 9</desc><text x="2" y="9">p50</text>'
    '<polyline points="0,10 40,6 80,2"/></svg>'
    "nine percent as the <ruby>東京<rp>（</rp><rt>とうきょう</rt><rp>）</rp></ruby> "
    "office reported this spring; pick a region "
    '<select name="region"><option>East<option>West<option selected>North</select> '
    "<button class=cta>Apply filters</button>and then confirm the filing window.</p>"
    "</article>" + P_TAIL[len(_ARTICLE_CLOSE) :]
)
# Invisible-format-character page (q_extract_invisible): a final
# paragraph salted with every STRIPPED code point of the normalize
# policy (webx/recognize.py _INVIS_RE) — soft hyphens raw and as
# &shy;, zero-width space, bidi embeddings/isolates, word joiner, a
# mid-body FEFF whose removal must leave ONE space (strip runs before
# whitespace collapse) — plus the two KEPT joiners: ZWNJ inside a
# Persian verb and ZWJ inside a family emoji. The expected extra line
# is this constant:
INVISIBLE_LINE = (
    "The hyphenation engine reflows long compound words; a "
    "zerowidthspace splits tokens invisibly, RTL embedded and isolated "
    "runs carry bidi controls, thewordjoiner and a stray mid-body BOM "
    "vanish too, while the Persian form "
    "\u0645\u06cc\u200c\u062e\u0648\u0627\u0647\u0645 and the "
    "family emoji \U0001f468\u200d\U0001f469\u200d\U0001f467 keep "
    "their joiners."
)
P_TAIL_INVISIBLE = (
    "</p><p>The hy\u00adphen\u00adation engine re\u00adflows long "
    "com&shy;pound words; a zero\u200bwidth\u200bspace splits tokens "
    "invisibly, \u202bRTL embedded\u202c and \u2066isolated\u2069 "
    "runs carry bidi controls, the\u2060word\u2060joiner and a "
    "stray \ufeff mid-body BOM vanish too, while the Persian form "
    "\u0645\u06cc\u200c\u062e\u0648\u0627\u0647\u0645 and the "
    "family emoji \U0001f468\u200d\U0001f469\u200d\U0001f467 keep "
    "their joiners.</p>"
    "</article>" + P_TAIL[len(_ARTICLE_CLOSE) :]
)
# Canonical-composition page (q_extract_nfc): a final paragraph written
# in DECOMPOSED form — combining acute/diaeresis sequences, conjoining
# Hangul jamo, the Angstrom- and Ohm-sign singletons — plus one
# sequence with no precomposed form (q + combining acute) that NFC
# must leave alone. With ExtractConfig(nfc=True) the expected line is
# NFC of the source (derived at import — one source of truth); DuckDB's
# nfc_normalize produces the same bytes (the cross-engine contract the
# oracle replays over this same decomposed literal).
NFC_SRC = (
    "Re\u0301sume\u0301s at the cafe\u0301 mention a 5 "
    "\u212bngstro\u0308m gap, a 3 \u2126 load, the Hangul word "
    "\u1112\u1161\u11ab\u1100\u1173\u11af, and the rare q\u0301 "
    "sequence which has no precomposed form at all."
)
NFC_LINE = _ud.normalize("NFC", NFC_SRC)
assert NFC_LINE != NFC_SRC  # the page really exercises composition
P_TAIL_NFC = (
    "</p><p>" + NFC_SRC + "</p>"
    "</article>" + P_TAIL[len(_ARTICLE_CLOSE) :]
)
# Heading-rescue page (q_extract_headline): a 1990s-newsletter-style
# story headline — <font size=3><b>…</b></font><br> with NO h1..h6
# element — directly before the article paragraph. Its inline-tag
# density fails binary_thresh (34 text bytes, 4 inline tags → score
# 34/(34+4*8+1) = 0.507 < 0.55) so only the heading-rescue predicate
# (webx/detect.py merge_runs_table) keeps it: link-free, short, score
# >= rescue_thresh, immediately preceding a base candidate. The page
# also carries a NEGATIVE control before the <h1>: an ISSN strapline
# whose score 8/(8+4*8+1) = 0.195 sits BELOW rescue_thresh (0.30) and
# must stay dropped even though it too precedes a base candidate.
HEADLINE_LINE = "Icebreaker convoys resume next weekend"
_HL_TLEN = sum(len(w) for w in HEADLINE_LINE.split())
assert 15 <= _HL_TLEN <= 40  # keeps the score inside [0.30, 0.55)
P_ISSN = '<font size="1"><i>ISSN 4721</i></font><br>'
P_CHROME_ISSN = P_CHROME[: -len(_ARTICLE_OPEN)] + P_ISSN + _ARTICLE_OPEN
P_MID_HEADLINE = (
    '</h1><font size="3"><b>' + HEADLINE_LINE + "</b></font><br><p>"
)
# Preformatted-code page (q_extract_pre): the article ends with a
# <pre><code> sample whose indentation and interior spacing ARE content
# (webx/recognize.py pre_regions / decode_span_pre — no whitespace
# collapse inside pre). The in-page form escapes '<'; the expected
# lines are these constants verbatim (entities decoded, four-space
# indent and double spaces preserved).
PRE_LINES = (
    "$ veldt pack --jobs 4",
    "    if (i < j)  total += rows[i];",
    "        return total",
)
PRE_SAMPLE = "\n".join(PRE_LINES)
_PRE_PAGE = PRE_SAMPLE.replace("&", "&amp;").replace("<", "&lt;")
P_TAIL_PRE = (
    "</p><pre><code>" + _PRE_PAGE + "</code></pre></article>"
    + P_TAIL[len(_ARTICLE_CLOSE) :]
)
# Comment-separation page (q_split_comments): a comments section after
# the article whose content must route into the comment_text column
# (webx/comments.py split_comments — byte-partition of spans against
# depth-tracked class/id comment regions), leaving the main text
# byte-identical to the flagship closed form.
COMMENT_LINES = (
    "Comments",
    "The harbour cam shows the first convoy already queued at the lock.",
    "Correction: the surcharge vote was four to one, not unanimous.",
)
P_TAIL_COMMENTS = (
    _ARTICLE_CLOSE
    + '<section class="comments"><h3>' + COMMENT_LINES[0] + "</h3>"
    + '<div class="comment"><p>' + COMMENT_LINES[1] + "</p></div>"
    + '<div class="comment"><p>' + COMMENT_LINES[2] + "</p></div></section>"
    + P_TAIL[len(_ARTICLE_CLOSE) :]
)
# Data-table page (q_extract_tables): the article carries a spec table
# (caption + th header row + three fact rows whose value cells are
# closed-form functions of documents columns) followed by a pure-link
# layout table that the data/layout classifier (webx/tables.py) must
# reject (anchor-text ratio 1.0). Expected cells: 4 rows × 2 cols for
# table_idx 0 only.
TABLE_CAPTION = "Document facts"
P_TABLE_PRE = (
    '</p><table class="specs"><caption>' + TABLE_CAPTION + "</caption>"
    "<tr><th>Property</th><th>Value</th></tr>"
    "<tr><td>Identifier</td><td>"
)
P_TABLE_MID1 = "</td></tr><tr><td>Language</td><td>"
P_TABLE_MID2 = "</td></tr><tr><td>Score</td><td>"
P_TABLE_POST = (
    "</td></tr></table>"
    '<table width="100%"><tr><td><a href="/arch">Archive</a></td>'
    '<td><a href="/sub">Subscribe</a></td></tr></table></article>'
    + P_TAIL[len(_ARTICLE_CLOSE) :]
)
ENTITY_DEMO = "Fish &amp; chips &lt;tag&gt; &#65;&#x42; &hellip; "
ENTITY_DEMO_DECODED = "Fish & chips <tag> AB … "
BOILER_ONLY_BODY = (
    "</title></head><body>"
    '<header><nav><ul><li><a href="/">Home</a></li><li><a href="/x">X</a></li></ul></nav></header>'
    '<footer><p>© 2026 Example Corp.</p></footer></body></html>'
)

WS_CLASS = "[ \\t\\r\\n\\f\\x0B]+"  # Java + RE2 compatible whitespace class


def template_constants() -> dict:
    """Byte-length constants for oracle arithmetic (ASCII parts only)."""
    return {
        "head_utf8": len(P_HEAD_UTF8),
        "chrome": len(P_CHROME),
        "mid": len(P_MID),
        "mid2": len(P_MID2),
        "entity_demo": len(ENTITY_DEMO),
        "tail_bytes": len(P_TAIL.encode("utf-8")),
    }


# ------------------------------------------------------------ column exprs

def _norm(col):  # whitespace-normalize, the contract both sides share
    return F.trim(F.regexp_replace(col, WS_CLASS, " "))


def _esc(col):  # minimal HTML escape for text nodes
    c = F.replace(col, F.lit("&"), F.lit("&amp;"))
    c = F.replace(c, F.lit("<"), F.lit("&lt;"))
    return F.replace(c, F.lit(">"), F.lit("&gt;"))


def _did():
    return F.concat(F.lit("Doc "), F.col("doc_id").cast("string"))


def _url():
    return F.concat(
        F.lit("https://h"),
        (F.col("doc_id") % 7).cast("string"),
        F.lit(".example.com/doc/"),
        F.col("doc_id").cast("string"),
    )


def _warc_ts():
    return F.timestamp_seconds(F.lit(1704067200) + F.col("doc_id"))


def _assemble(html_str_col) -> list:
    return [
        _url().alias("url"),
        _warc_ts().alias("warc_ts"),
        F.encode(html_str_col, "UTF-8").alias("html"),
        F.col("text"),
        F.col("lang"),
    ]


def load_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def synth_pages(spark: SparkSession, sf_dir: str, page_repeat: int = 1) -> DataFrame:
    """Flagship single-article pages. Expected text:
    ``'Doc '||doc_id||'\\n'||norm(text)``.

    ``page_repeat`` > 1 repeats the paragraph text (bench-only knob: page
    sizes approach real crawl pages; oracle queries always use 1)."""
    docs = load_documents(spark, sf_dir)
    if page_repeat > 1:
        docs = docs.withColumn(
            "text", F.array_join(F.array_repeat(F.col("text"), page_repeat), " ")
        )
    return flagship_pages_from_docs(docs)


def flagship_pages_from_docs(docs: DataFrame) -> DataFrame:
    """Flagship pages assembled from an arbitrary documents-shaped frame
    (doc_id, text, lang) — the synth_pages body, factored out so snapshot
    queries can build a MODIFIED second snapshot from edited documents."""
    did, esc = _did(), _esc(_norm(F.col("text")))
    html = F.concat(
        F.lit(P_HEAD_UTF8), did, F.lit(P_CHROME), did, F.lit(P_MID), esc, F.lit(P_TAIL)
    )
    return docs.select(*_assemble(html))


def golden_flagship_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(url, spans[{start,end}]) — closed-form golden byte spans of the
    flagship template for EVERY document (the annotator's ground truth;
    pages without the article, e.g. synth_pages_edge boiler-only rows,
    simply have nothing matching these spans)."""
    c = template_constants()
    docs = load_documents(spark, sf_dir)
    did_len = F.length(_did())
    esc_len = F.length(_esc(_norm(F.col("text"))))
    start = F.lit(c["head_utf8"]) + did_len + F.lit(c["chrome"])
    end = start + did_len + F.lit(c["mid"]) + esc_len
    return docs.select(
        _url().alias("url"),
        F.array(
            F.struct(
                start.cast("long").alias("start"), end.cast("long").alias("end")
            )
        ).alias("spans"),
    )


def synth_pages_overlay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship page wrapped in modern consent chrome: a GDPR modal
    before the article and a newsletter strip after it (both pure-ASCII
    template constants). Expected text is UNCHANGED from the flagship —
    ``'Doc '||doc_id||'\\n'||norm(text)`` — which gates the class/id-hint
    boilerplate regions: the modal's long, link-free paragraph survives
    every density gate and is dropped only by the hint region."""
    docs = load_documents(spark, sf_dir)
    did, esc = _did(), _esc(_norm(F.col("text")))
    html = F.concat(
        F.lit(P_HEAD_UTF8), did, F.lit(P_CHROME_MODAL), did, F.lit(P_MID),
        esc, F.lit(P_TAIL_STRIP),
    )
    return docs.select(*_assemble(html))


def synth_pages_headline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship page with a font/bold story headline between the <h1>
    and the paragraph (P_MID_HEADLINE) plus a sub-threshold ISSN
    strapline before the article (P_CHROME_ISSN). Expected text:
    ``'Doc '||doc_id||'\\n'||HEADLINE_LINE||'\\n'||norm(text)`` — the
    headline is kept ONLY by the heading-rescue predicate; the ISSN
    line must never appear."""
    docs = load_documents(spark, sf_dir)
    did, esc = _did(), _esc(_norm(F.col("text")))
    html = F.concat(
        F.lit(P_HEAD_UTF8), did, F.lit(P_CHROME_ISSN), did,
        F.lit(P_MID_HEADLINE), esc, F.lit(P_TAIL),
    )
    return docs.select(*_assemble(html))


def synth_pages_comments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship page followed by a comments section (P_TAIL_COMMENTS).
    Expected: main text = flagship closed form; comment_text =
    COMMENT_LINES joined by newlines."""
    docs = load_documents(spark, sf_dir)
    did, esc = _did(), _esc(_norm(F.col("text")))
    html = F.concat(
        F.lit(P_HEAD_UTF8), did, F.lit(P_CHROME), did, F.lit(P_MID),
        esc, F.lit(P_TAIL_COMMENTS),
    )
    return docs.select(*_assemble(html))


def synth_pages_pre(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship page whose article ends with a <pre><code> sample
    (P_TAIL_PRE). Expected text: flagship closed form + '\\n' +
    PRE_SAMPLE verbatim — indentation and double spaces preserved, the
    escaped operators decoded."""
    docs = load_documents(spark, sf_dir)
    did, esc = _did(), _esc(_norm(F.col("text")))
    html = F.concat(
        F.lit(P_HEAD_UTF8), did, F.lit(P_CHROME), did, F.lit(P_MID),
        esc, F.lit(P_TAIL_PRE),
    )
    return docs.select(*_assemble(html))


def synth_pages_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship page whose article ends with a captioned spec table
    (header row + Identifier/Language/Score facts) and a link-only
    layout table. Expected data-table cells are closed-form:
    ('Property','Value' | 'Identifier','Doc N' | 'Language',lang |
    'Score', N % 97), caption TABLE_CAPTION, table_idx 0."""
    docs = load_documents(spark, sf_dir)
    did, esc = _did(), _esc(_norm(F.col("text")))
    html = F.concat(
        F.lit(P_HEAD_UTF8), did, F.lit(P_CHROME), did, F.lit(P_MID), esc,
        F.lit(P_TABLE_PRE), did, F.lit(P_TABLE_MID1), F.col("lang"),
        F.lit(P_TABLE_MID2), (F.col("doc_id") % 97).cast("string"),
        F.lit(P_TABLE_POST),
    )
    return docs.select(*_assemble(html))


def synth_pages_rawkept(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship page whose article ends with an <xmp> markup sample.
    Expected text: flagship closed form + '\\n' + XMP_SAMPLE verbatim
    (raw-kept: tags literal, entities undecoded)."""
    docs = load_documents(spark, sf_dir)
    did, esc = _did(), _esc(_norm(F.col("text")))
    html = F.concat(
        F.lit(P_HEAD_UTF8), did, F.lit(P_CHROME), did, F.lit(P_MID),
        esc, F.lit(P_TAIL_XMP),
    )
    return docs.select(*_assemble(html))


def synth_pages_nonprose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship page whose article ends with a paragraph full of
    non-prose drop regions (svg/ruby/select/button). Expected text:
    flagship closed form + '\\n' + NONPROSE_LINE (the regions' text —
    a11y title/desc, chart labels, furigana, option and button labels —
    must vanish without splitting the surrounding words)."""
    docs = load_documents(spark, sf_dir)
    did, esc = _did(), _esc(_norm(F.col("text")))
    html = F.concat(
        F.lit(P_HEAD_UTF8), did, F.lit(P_CHROME), did, F.lit(P_MID),
        esc, F.lit(P_TAIL_NONPROSE),
    )
    return docs.select(*_assemble(html))


def synth_pages_invisible(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship page whose article ends with a paragraph salted with
    invisible format characters (P_TAIL_INVISIBLE). Expected text:
    flagship closed form + '\\n' + INVISIBLE_LINE — soft hyphens (raw
    and &shy;), ZWSP, bidi controls, word joiner and a mid-body FEFF
    stripped; ZWNJ/ZWJ kept (webx/recognize.py _INVIS_RE policy)."""
    docs = load_documents(spark, sf_dir)
    did, esc = _did(), _esc(_norm(F.col("text")))
    html = F.concat(
        F.lit(P_HEAD_UTF8), did, F.lit(P_CHROME), did, F.lit(P_MID),
        esc, F.lit(P_TAIL_INVISIBLE),
    )
    return docs.select(*_assemble(html))


def synth_pages_nfc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship page whose article ends with a decomposed-Unicode
    paragraph (P_TAIL_NFC). With ExtractConfig(nfc=True) the expected
    text is flagship closed form + '\\n' + NFC_LINE (= NFC of the
    decomposed source; singletons composed, jamo conjoined, the
    no-precomposed q+acute sequence untouched)."""
    docs = load_documents(spark, sf_dir)
    did, esc = _did(), _esc(_norm(F.col("text")))
    html = F.concat(
        F.lit(P_HEAD_UTF8), did, F.lit(P_CHROME), did, F.lit(P_MID),
        esc, F.lit(P_TAIL_NFC),
    )
    return docs.select(*_assemble(html))


def synth_pages_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-article pages separated by a link-farm ad div. Expected text:
    ``'Doc '||id||'\\n'||norm||'\\nNotes\\n'||upper(norm)`` — two spans."""
    docs = load_documents(spark, sf_dir)
    did = _did()
    norm = _norm(F.col("text"))
    html = F.concat(
        F.lit(P_HEAD_UTF8), did, F.lit(P_CHROME), did, F.lit(P_MID),
        _esc(norm), F.lit(P_MID2), _esc(F.upper(norm)), F.lit(P_TAIL),
    )
    return docs.select(*_assemble(html))


def synth_pages_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship page whose paragraph starts with an entity gauntlet.
    Expected text: ``'Doc '||id||'\\n'||ENTITY_DEMO_DECODED||norm(text)``."""
    docs = load_documents(spark, sf_dir)
    did = _did()
    html = F.concat(
        F.lit(P_HEAD_UTF8), did, F.lit(P_CHROME), did, F.lit(P_MID),
        F.lit(ENTITY_DEMO), _esc(_norm(F.col("text"))), F.lit(P_TAIL),
    )
    return docs.select(*_assemble(html))


def synth_pages_edge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """doc_id%5==0 → boilerplate-only page (no main content, the ``'[]'``
    empty-annotation analog, det_dataset.py:131-132); else flagship page."""
    docs = load_documents(spark, sf_dir)
    did, esc = _did(), _esc(_norm(F.col("text")))
    full = F.concat(
        F.lit(P_HEAD_UTF8), did, F.lit(P_CHROME), did, F.lit(P_MID), esc, F.lit(P_TAIL)
    )
    boiler = F.concat(F.lit(P_HEAD_UTF8), did, F.lit(BOILER_ONLY_BODY))
    html = F.when(F.col("doc_id") % 5 == 0, boiler).otherwise(full)
    return docs.select(*_assemble(html))


def synth_pages_latin1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """latin-1 encoded pages with a non-ASCII token. Expected text:
    ``'Doc '||id||'\\n'||norm(text)||' caf'||chr(233)``."""
    docs = load_documents(spark, sf_dir)
    did = _did()
    content = F.concat(_esc(_norm(F.col("text"))), F.lit(" café"))
    html_str = F.concat(
        F.lit(P_HEAD_LATIN1), did, F.lit(P_CHROME), did, F.lit(P_MID), content,
        # ASCII-only tail for latin-1 (strip the © / · chars)
        F.lit("</p></article><footer><p>(c) 2026 Example Corp.</p></footer></body></html>"),
    )
    return docs.select(
        _url().alias("url"),
        _warc_ts().alias("warc_ts"),
        F.encode(html_str, "ISO-8859-1").alias("html"),
        F.col("text"),
        F.col("lang"),
    )


def synth_pages_dated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship pages with publication-date markers rotating by
    doc_id % 5 to exercise every lane AND the precedence chain of
    webx.metadata.publish_dates (each lane carries a DIFFERENT date, so
    a precedence violation is a value mismatch, not just a source one):

    * k=0: meta + JSON-LD + <time> + URL date → 'meta' wins (base+0)
    * k=1: JSON-LD + <time> + URL date       → 'jsonld' wins (base+1)
    * k=2: <time> + URL date                 → 'time' wins (base+2)
    * k=3: URL date only                     → 'url' wins (base+3)
    * k=4: no date anywhere                  → ('', '')

    base = 2024-01-01 + (doc_id % 300) days — closed-form for the DuckDB
    oracle. URL-dated rows get '/<yyyy/MM/dd>/post' appended to the
    flagship URL."""
    docs = load_documents(spark, sf_dir)
    did, esc = _did(), _esc(_norm(F.col("text")))
    k = F.col("doc_id") % 5
    base = F.date_add(
        F.to_date(F.lit("2024-01-01")), (F.col("doc_id") % 300).cast("int")
    )
    d = lambda off: F.date_format(F.date_add(base, off), "yyyy-MM-dd")  # noqa: E731
    meta_tag = F.concat(
        F.lit('<meta property="article:published_time" content="'),
        d(0),
        F.lit('T08:30:00Z">'),
    )
    jsonld_tag = F.concat(
        F.lit('<script type="application/ld+json">'
              '{"@type":"Article","datePublished":"'),
        d(1),
        F.lit('T00:00:00Z"}</script>'),
    )
    time_tag = F.concat(F.lit('<time datetime="'), d(2), F.lit('">posted</time>'))
    markers = F.concat(
        F.when(k == 0, meta_tag).otherwise(F.lit("")),
        F.when(k <= 1, jsonld_tag).otherwise(F.lit("")),
        F.when(k <= 2, time_tag).otherwise(F.lit("")),
    )
    html = F.concat(
        F.lit(P_HEAD_UTF8), did, F.lit(P_CHROME), did, F.lit(P_MID), esc,
        markers, F.lit(P_TAIL),
    )
    url = F.when(
        k <= 3,
        F.concat(
            _url(), F.lit("/"), F.date_format(F.date_add(base, 3), "yyyy/MM/dd"),
            F.lit("/post"),
        ),
    ).otherwise(_url())
    return docs.select(
        url.alias("url"),
        _warc_ts().alias("warc_ts"),
        F.encode(html, "UTF-8").alias("html"),
        F.col("text"),
        F.col("lang"),
    )


# -------------------------------------------------- gnarly template family
# Messy-real-web markup (the paste-real-data system-test discipline of the
# reference, tests/st/test_train_eval_dummy.py:22-100, applied to HTML):
# conditional comments, downlevel-revealed text, unclosed <li>/<td>/<table>
# soup, CDATA ghosts, script/style strings containing fake tags, mis-nested
# inline tags, quoted '>' in attributes, uppercase/unquoted markup, BOM,
# duplicate <body>, trailing junk after </html>, mixed-script boilerplate.
# INVARIANT: every template still extracts to the SAME closed form as the
# flagship ('Doc '||doc_id||'\n'||norm(text)) — messiness lives in chrome
# blocks that are boilerplate-flagged, link-dense, or under the
# min_span_chars floor, and in constructs that strip to pure whitespace
# inside the content span. tests/test_gnarly_pages.py asserts the per-
# template block/score anatomy; q_extract_gnarly is the oracle gate.

_G0_PRE = (
    '<!DOCTYPE html><!--[if lt IE 9]><script src="/ie-shim.js"></script><![endif]-->'
    '<html><head><meta charset="utf-8">'
    '<!--[if IE 6]><link rel="stylesheet" href="/ie6.css"><![endif]--><title>'
)
_G0_MID = (
    "</title></head><body>"
    "<nav><![if !IE]><p>Please upgrade to a modern browser.</p><![endif]>"
    '<ul><li><a href="/">Home</a><li><a href="/faq">FAQ</a><li><a href="/news">News</a></ul></nav>'
    '<!--[if lte IE 8]><div class="warn"><p>Legacy layout engaged</p></div><![endif]-->'
    "<article><h1>"
)
_G0_MID2 = "</h1><!-- hero --><p>"
_G0_TAIL = (
    '</p></article><div id="ft"><![if !IE]><!-- legacy spacer --><![endif]></div>'
    "<footer><p>&copy; 2026 Example</p></footer></body></html>"
)

_G1_PRE = "<html><head><title>"
_G1_MID = (
    "</title><body bgcolor=white text=black>"
    "<table width=100% border=0 cellpadding=0><tr><td class=topnav>"
    '<a href="/">Home</a> | <a href="/archive">Archive</a> | <a href="/about">About</a> | <a href="/mail">Mail</a>'
    '<tr><td><img src="/banner.gif" width=468 height=60 alt="">'
    "<table><tr><td><article><h1>"
)
_G1_MID2 = "</h1><p>"
_G1_TAIL = (
    '</p></article><table><tr><td align=center>'
    '<a href="/legal">&copy; 1999 Example Corp</a></body></html>'
)

_G2_PRE = (
    '<?xml version="1.0" encoding="utf-8"?>'
    '<!DOCTYPE html PUBLIC "-//W3C//DTD XHTML 1.0 Strict//EN" '
    '"http://www.w3.org/TR/xhtml1/DTD/xhtml1-strict.dtd">'
    '<html xmlns="http://www.w3.org/1999/xhtml"><head><meta charset="utf-8"/>'
    '<style type="text/css">/*<![CDATA[*/ body{margin:0} .hdr>ul li a{color:#900} /*]]>*/</style>'
    '<script type="text/javascript">var tricky="</p><div>ghost</div>";'
    'if(2<3&&tricky>""){document.title=tricky}</script><title>'
)
_G2_MID = (
    '</title></head><body><div class="hdr"><ul>'
    '<li><a href="/">Home</a></li><li><a href="/x">Docs</a></li></ul></div>'
    "<!-- main -- ><article><h1>"
)
_G2_MID2 = "</h1><![CDATA[ <p>ghost paragraph that must never surface</p> ]]><p>"
_G2_TAIL = (
    '</p><p class="tags"><a href="/t/web">web</a> <a href="/t/xml">xml</a> '
    '<a href="/t/legacy">legacy</a></p></article></body><!-- page ok --></html>'
)

_G3_PRE = "<!doctype HTML><HTML><HEAD><META CHARSET=UTF-8><TITLE>"
_G3_MID = (
    "</TITLE></HEAD><BODY>"
    '<DIV CLASS="breadcrumb"><A HREF="/">Home</A> &raquo; <A HREF="/kb">KB</A>'
    " &raquo; <SPAN>Article</SPAN></DIV><ARTICLE><H1>"
)
_G3_MID2 = (
    "</H1><P DATA-META='{\"html\":\"<p>5>4</p>\",\"ok\":true}'>"
    '<SPAN STYLE="font-weight:bold">'
)
_G3_TAIL = (
    '</i></P></ARTICLE><DIV ID="share"><A HREF="/s/t">Tweet</A> '
    '<A HREF="/s/f">Share</A> <A HREF="/s/l">Link</A></DIV></BODY></HTML>'
)

_G4_PRE = (
    '<!DOCTYPE html><html lang="en"><head><meta charset="utf-8">'
    '<meta property="og:title" content="A &gt; B article">'
    '<script type="application/ld+json">'
    '{"@type":"Article","headline":"<h1>fake</h1>","x":"</div>"}</script><title>'
)
_G4_MID = (
    '</title></head><body class="theme-light wide">'
    '<div class="wrap"><div class="row"><div class="col col-12">'
    '<header class="site"><div class="brand">Example</div>'
    '<nav class="menu"><a href="/">Home</a><a href="/blog">Blog</a>'
    '<a href="/shop">Shop</a><a href="/cart">Cart (0)</a></nav></header>'
    '<div class="share-bar"><a href="/sh/tw">Tweet</a><a href="/sh/fb">Like</a>'
    '<a href="/sh/in">Post</a></div>'
    '<div class="content-area"><article class="post"><h1 class="post-title">'
)
_G4_MID2 = '</h1><div class="post-body"><p>'
_G4_TAIL = (
    "</p></div></article></div>"
    '<aside class="sidebar"><h3>Trending</h3><ul>'
    '<li><a href="/p/1">One weird trick</a></li>'
    '<li><a href="/p/2">Top 10 lists</a></li></ul></aside></div></div>'
    '<footer class="site"><p>示例公司 &middot; 2026 &middot; Alle Rechte '
    "vorbehalten &middot; جميع الحقوق محفوظة</p></footer></body></html>"
)

_G5_PRE = (
    "\ufeff<!DOCTYPE html><html><head>"
    '<meta http-equiv="Content-Type" content="text/html; charset=utf-8"><title>'
)
_G5_MID = (
    '</title></head><body><body class="dup">'
    '<noscript><img src="/px.gif" width=1 height=1 alt="">'
    "JavaScript is disabled in your browser.</noscript>"
    '<header><nav><a href="/">Start</a><a href="/help">Help</a></nav></header>'
    "</div></div><article><h1>"
)
_G5_MID2 = '</h1><p id="c1">'
_G5_TAIL = (
    '</p></article><footer><p><a href="/imprint">Imprint</a> '
    '<a href="/privacy">Privacy</a></p></footer></body></html>'
    '<div class="srv">cache hit 0.003s</div>'
)

GNARLY_PARTS = [
    (_G0_PRE, _G0_MID, _G0_MID2, _G0_TAIL),
    (_G1_PRE, _G1_MID, _G1_MID2, _G1_TAIL),
    (_G2_PRE, _G2_MID, _G2_MID2, _G2_TAIL),
    (_G3_PRE, _G3_MID, _G3_MID2, _G3_TAIL),
    (_G4_PRE, _G4_MID, _G4_MID2, _G4_TAIL),
    (_G5_PRE, _G5_MID, _G5_MID2, _G5_TAIL),
]


def synth_pages_gnarly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Messy-markup pages, template rotated by ``doc_id % 6``. Expected
    text for EVERY row is the flagship closed form
    ``'Doc '||doc_id||'\\n'||norm(text)`` — the mess must be invisible."""
    docs = load_documents(spark, sf_dir)
    did, esc = _did(), _esc(_norm(F.col("text")))
    k = (F.col("doc_id") % len(GNARLY_PARTS) + 1).cast("int")
    part = lambda i: F.element_at(  # noqa: E731
        F.array(*[F.lit(p[i]) for p in GNARLY_PARTS]), k
    )
    html = F.concat(part(0), did, part(1), did, part(2), esc, part(3))
    return docs.select(*_assemble(html))


# ------------------------------------------------ charset edge rotation
# Each case distinguishes the WHATWG prescan (webx/charset.py) from a
# naive "first charset= substring" sniff; expected text is the flagship
# closed form plus a per-case suffix (closed-form oracle).

_CS_COMMENT_HEAD = (
    '<!DOCTYPE html><html><head>'
    '<!-- legacy served <meta charset="koi8-r"> until 2009 -->'
    '<meta charset="utf-8"><title>'
)
_CS_LATIN1_HEAD = "<!DOCTYPE html><html><head><meta charset=latin1><title>"
_CS_XUD_HEAD = (
    '<!DOCTYPE html><html><head><meta charset="x-user-defined"><title>'
)
_CS_U16_PRAGMA_HEAD = (
    '<!DOCTYPE html><html><head>'
    '<meta http-equiv="Content-Type" content="text/html; charset=utf-16"><title>'
)
CS_SUFFIX_CAFE = " café"
CS_SUFFIX_EURO = " €1999"
CS_SUFFIX_KEY = " key "  # followed by raw byte 0xA3 → U+F7A3 (x-user-defined)


def synth_pages_charset_edge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Charset edge cases rotated by ``doc_id % 5``:

    0. lying ``koi8-r`` meta inside a comment + real utf-8 meta — the
       prescan must skip the comment (a substring sniff decodes mojibake);
    1. whole page BOM-less UTF-16LE — detected from the NUL interleave
       of the leading ``<`` and transcoded before tokenization;
    2. ``<meta charset=latin1>`` on windows-1252 bytes containing € (0x80)
       — the WHATWG registry maps the latin1 label to cp1252;
    3. ``x-user-defined`` page with byte 0xA3 → U+F7A3 (private use);
    4. pragma-declared ``charset=utf-16`` on utf-8 bytes — per spec a
       UTF-16 label on ASCII-shaped bytes resolves to utf-8.

    Expected text: flagship closed form + per-case suffix."""
    docs = load_documents(spark, sf_dir)
    did, esc = _did(), _esc(_norm(F.col("text")))
    k = F.col("doc_id") % 5
    tail_ascii = (
        "</p></article><footer><p>(c) 2026 Example Corp.</p></footer></body></html>"
    )

    def body(head: str, suffix) -> "F.Column":
        return F.concat(
            F.lit(head), did, F.lit(P_CHROME), did, F.lit(P_MID), esc,
            suffix, F.lit(tail_ascii),
        )

    cafe = F.lit(CS_SUFFIX_CAFE)
    html = (
        F.when(k == 0, F.encode(body(_CS_COMMENT_HEAD, cafe), "UTF-8"))
        .when(k == 1, F.encode(body(P_HEAD_UTF8, cafe), "UTF-16LE"))
        .when(
            k == 2,
            # cp1252 page: document text is pure ASCII (== cp1252 bytes);
            # € is the one non-ASCII byte, spliced in as raw 0x80 (Spark's
            # encode() has no windows-1252)
            F.concat(
                F.encode(
                    F.concat(
                        F.lit(_CS_LATIN1_HEAD), did, F.lit(P_CHROME), did,
                        F.lit(P_MID), esc, F.lit(" "),
                    ),
                    "UTF-8",
                ),
                F.lit(bytes([0x80])),
                F.encode(F.lit("1999" + tail_ascii), "UTF-8"),
            ),
        )
        .when(
            k == 3,
            # the 0xA3 byte sits INSIDE the paragraph, right after the
            # " key " suffix, so it is part of the extracted span
            F.concat(
                F.encode(
                    F.concat(
                        F.lit(_CS_XUD_HEAD), did, F.lit(P_CHROME), did,
                        F.lit(P_MID), esc, F.lit(CS_SUFFIX_KEY),
                    ),
                    "UTF-8",
                ),
                F.lit(bytes([0xA3])),
                F.encode(F.lit(tail_ascii), "UTF-8"),
            ),
        )
        .otherwise(F.encode(body(_CS_U16_PRAGMA_HEAD, cafe), "UTF-8"))
    )
    return docs.select(
        _url().alias("url"),
        _warc_ts().alias("warc_ts"),
        html.alias("html"),
        F.col("text"),
        F.col("lang"),
    )


def synth_pdfs(spark: SparkSession, sf_dir: str, layout: str = "mixed",
               docs: "DataFrame | None" = None) -> DataFrame:
    """Deterministic text-PDF per document → (url, pdf). Same
    generate-input-from-expected-output trick as the HTML pages: the PDF
    shows 'Doc N' then the normalized text, so the expected extraction is
    the SAME closed form as the flagship (`'Doc '||doc_id||'\\n'||norm`).
    The binary container is assembled in a distributed Arrow pass
    (fixture generation, like webx.sources.write_warc — the QUERY path
    is webx.pdf.extract_pdf). ``layout='mixed'`` rotates every parser
    lane (classic xref, xref-stream ± predictor, CID/ToUnicode, and the
    two encrypted lanes); ``layout='cid'`` makes every document a
    composite-font hex-string PDF (the q_extract_pdf_cid gate);
    ``layout='encrypted'`` makes EVERY document an encrypted one,
    cycling RC4-128/RC4-40/AESV2 by doc_id % 3 (the
    q_extract_pdf_encrypted gate)."""
    from typing import Iterable, Iterator

    import pandas as pd
    from pyspark.sql import types as T

    from webx.pdf import (
        write_pdf,
        write_pdf_cid,
        write_pdf_encrypted,
        write_pdf_xrefstream,
    )

    src = (docs if docs is not None else load_documents(spark, sf_dir)).select(
        _url().alias("url"),
        F.col("doc_id"),
        _did().alias("title"),
        _norm(F.col("text")).alias("body"),
    )
    schema = T.StructType(
        [T.StructField("url", T.StringType()), T.StructField("pdf", T.BinaryType())]
    )

    def fn(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for p in batches:
            # deterministic layout mix so every parser lane is exercised:
            # doc%16 == 0 → classic xref + Flate, {2,10} → LZWDecode
            # (10: EarlyChange=0), {4,12} → ASCII85-over-Flate chain /
            # ASCIIHex, 6 → raw, 8 → ENCRYPTED RC4 (128-bit R3; every
            # other one 40-bit R2), 14 → ENCRYPTED AES-128 (AESV2),
            # %8==1 → xref stream with the PNG-Up predictor, %8==5 →
            # xref stream unpredicted (16==13: AES-ENCRYPTED xref-stream
            # layout — encrypted ObjStm + content, plain XRef), %8∈{3,7} → composite-font (CID
            # hex strings + ToUnicode)
            even_lane = {
                0: "flate", 2: "lzw", 4: "a85flate", 6: "raw",
                10: "lzw0", 12: "ahx",
            }
            pdfs = []
            for d, t, b in zip(p["doc_id"], p["title"], p["body"]):
                if layout == "cid":
                    pdfs.append(write_pdf_cid(t, b))
                elif layout == "encrypted":
                    if d % 3 == 0:
                        pdfs.append(write_pdf_encrypted(t, b, "rc4"))
                    elif d % 3 == 1:
                        pdfs.append(write_pdf_encrypted(t, b, "rc4", r=2))
                    else:
                        pdfs.append(write_pdf_encrypted(t, b, "aesv2"))
                elif d % 16 == 8:
                    pdfs.append(
                        write_pdf_encrypted(
                            t, b, "rc4", r=2 if d % 32 == 24 else None
                        )
                    )
                elif d % 16 == 14:
                    pdfs.append(write_pdf_encrypted(t, b, "aesv2"))
                elif d % 2 == 0:
                    pdfs.append(write_pdf(t, b, stream_filter=even_lane[d % 16]))
                elif d % 4 == 3:
                    pdfs.append(write_pdf_cid(t, b))
                else:
                    pdfs.append(
                        write_pdf_xrefstream(
                            t, b,
                            predictor=12 if d % 8 == 1 else 1,
                            # modern-writer encrypted form: AES content +
                            # ObjStm under a plain XRef stream
                            encrypted="aesv2" if d % 16 == 13 else None,
                        )
                    )
            yield pd.DataFrame({"url": p["url"], "pdf": pdfs})

    return src.mapInPandas(fn, schema=schema)
