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


def synth_pdfs(spark: SparkSession, sf_dir: str, layout: str = "mixed") -> DataFrame:
    """Deterministic text-PDF per document → (url, pdf). Same
    generate-input-from-expected-output trick as the HTML pages: the PDF
    shows 'Doc N' then the normalized text, so the expected extraction is
    the SAME closed form as the flagship (`'Doc '||doc_id||'\\n'||norm`).
    The binary container is assembled in a distributed Arrow pass
    (fixture generation, like webx.sources.write_warc — the QUERY path
    is webx.pdf.extract_pdf). ``layout='mixed'`` rotates every parser
    lane (classic xref, xref-stream ± predictor, CID/ToUnicode);
    ``layout='cid'`` makes every document a composite-font hex-string
    PDF (the q_extract_pdf_cid gate)."""
    from typing import Iterable, Iterator

    import pandas as pd
    from pyspark.sql import types as T

    from webx.pdf import write_pdf, write_pdf_cid, write_pdf_xrefstream

    src = load_documents(spark, sf_dir).select(
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
            # even docs → classic xref table, doc%8==1 → xref stream with
            # the PNG-Up predictor, doc%8==5 → xref stream unpredicted,
            # doc%8∈{3,7} → composite-font (CID hex strings + ToUnicode)
            pdfs = []
            for d, t, b in zip(p["doc_id"], p["title"], p["body"]):
                if layout == "cid":
                    pdfs.append(write_pdf_cid(t, b))
                elif d % 2 == 0:
                    pdfs.append(write_pdf(t, b, compress=True))
                elif d % 4 == 3:
                    pdfs.append(write_pdf_cid(t, b))
                else:
                    pdfs.append(
                        write_pdf_xrefstream(t, b, predictor=12 if d % 8 == 1 else 1)
                    )
            yield pd.DataFrame({"url": p["url"], "pdf": pdfs})

    return src.mapInPandas(fn, schema=schema)
