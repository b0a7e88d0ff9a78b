from __future__ import annotations

from pyspark.sql import functions as F

from webx.metadata import (
    dom_depth_stats,
    heading_outline,
    html_tables,
    structured_meta,
)


def _pages(spark, rows):
    return spark.createDataFrame(
        [(u, h.encode("utf-8")) for u, h in rows], "url string, html binary"
    )


# ------------------------------------------------------------ structured

def test_structured_meta_og_and_jsonld(spark):
    html = (
        "<html><head>"
        '<meta property="og:title" content="My Title">'
        "<meta content='article' property='og:type'>"
        '<script type="application/ld+json">'
        '{"@type": "NewsArticle", "headline": "Big News", '
        '"author": {"name": "A. Writer"}}'
        "</script></head><body></body></html>"
    )
    row = structured_meta(_pages(spark, [("u1", html)])).first()
    assert row["og_title"] == "My Title"
    assert row["og_type"] == "article"  # content-first attribute order
    assert row["jsonld_type"] == "NewsArticle"
    assert row["jsonld_headline"] == "Big News"
    assert row["jsonld_author"] == "A. Writer"


def test_structured_meta_missing_and_malformed(spark):
    rows = [
        ("none", "<html><head><title>t</title></head></html>"),
        (
            "bad",
            '<script type="application/ld+json">{not json</script>',
        ),
    ]
    out = {r["url"]: r for r in structured_meta(_pages(spark, rows)).collect()}
    for u in ("none", "bad"):
        assert out[u]["og_title"] == ""
        assert out[u]["jsonld_type"] == ""  # malformed JSON is fail-soft


# -------------------------------------------------------------- headings

def test_heading_outline_order_levels_and_cleaning(spark):
    html = (
        "<body><h1 class='x'>Top</h1><p>t</p>"
        "<h2> Sub <em>one</em> </h2><h3>Deep</h3><h2>Sub two</h2></body>"
    )
    rows = heading_outline(_pages(spark, [("u", html)])).orderBy("pos").collect()
    assert [(r["pos"], r["level"], r["heading"]) for r in rows] == [
        (0, 1, "Top"),
        (1, 2, "Sub one"),  # inner tags stripped, whitespace collapsed
        (2, 3, "Deep"),
        (3, 2, "Sub two"),
    ]


def test_heading_outline_backreference_no_cross_match(spark):
    # </h2> must not close an <h1>: backreference pairing.
    html = "<h1>A</h1><h2>B</h2>"
    rows = heading_outline(_pages(spark, [("u", html)])).collect()
    assert sorted((r["level"], r["heading"]) for r in rows) == [(1, "A"), (2, "B")]


def test_heading_outline_no_headings_drops_page(spark):
    assert heading_outline(_pages(spark, [("u", "<p>x</p>")])).count() == 0


# ---------------------------------------------------------------- tables

def test_html_tables_grid(spark):
    html = (
        "<table><tr><th>k</th><th>v</th></tr>"
        "<tr><td>a</td><td><b>1</b></td></tr>"
        "<tr><td>b</td><td>2</td></tr></table>"
    )
    rows = html_tables(_pages(spark, [("u", html)])).collect()
    grid = {(r["row_idx"], r["col_idx"]): (r["is_header"], r["cell"]) for r in rows}
    assert grid == {
        (0, 0): (1, "k"),
        (0, 1): (1, "v"),
        (1, 0): (0, "a"),
        (1, 1): (0, "1"),  # inner <b> stripped
        (2, 0): (0, "b"),
        (2, 1): (0, "2"),
    }


def test_html_tables_mixed_th_td_row(spark):
    html = "<table><tr><th>h</th><td>d</td></tr></table>"
    rows = html_tables(_pages(spark, [("u", html)])).orderBy("col_idx").collect()
    assert [(r["is_header"], r["cell"]) for r in rows] == [(1, "h"), (0, "d")]


# ------------------------------------------------------------- dom depth

def test_dom_depth_nesting(spark):
    html = "<html><body><div><div><p>x</p></div></div><p>y</p></body></html>"
    r = dom_depth_stats(_pages(spark, [("u", html)])).first()
    assert r["max_depth"] == 5  # html>body>div>div>p
    assert r["n_open_tags"] == 6
    assert r["n_tag_tokens"] == 12


def test_dom_depth_void_self_closed_and_script(spark):
    html = (
        "<html><body><br><img src='x'/>"
        "<script>if(1<2){var a='<div><div><div>'}</script>"
        "<p>t</p></body></html>"
    )
    r = dom_depth_stats(_pages(spark, [("u", html)])).first()
    # br/img don't nest; script body (with fake tags) is stripped.
    assert r["max_depth"] == 3  # html>body>p
    assert r["n_open_tags"] == 3


def test_dom_depth_stray_close_clamps(spark):
    r = dom_depth_stats(_pages(spark, [("u", "</div><p>x</p>")])).first()
    assert r["max_depth"] == 1
    assert r["n_open_tags"] == 1


def test_code_blocks_verbatim_whitespace(spark):
    """Indentation and newlines come through byte-verbatim (the
    opposite contract to the text lane); mandatory entities decode
    amp-last; lang hint from pre OR inner code class; blocks without
    content drop; &amp;lt; round-trips to the LITERAL '&lt;'."""
    from webx.metadata import code_blocks

    html = (
        b'<pre><code class="language-python">def f(x):\n'
        b"    if x &lt; 2:\n"
        b"        return x &amp;&amp; 1\n"
        b"</code></pre>"
        b'<pre class="lang-c++">int main() { return 0; }</pre>'
        b"<pre>plain &amp;lt; escaped</pre>"
        b"<pre>   \n</pre>"
    )
    pages = spark.createDataFrame([("u", html)], "url string, html binary")
    rows = code_blocks(pages).orderBy("block_idx").collect()
    assert [(r["block_idx"], r["lang_hint"], r["n_lines"]) for r in rows] == [
        (0, "python", 3),
        (1, "c++", 1),
        (2, "", 1),
    ]
    assert rows[0]["code"] == "def f(x):\n    if x < 2:\n        return x && 1"
    assert rows[1]["code"] == "int main() { return 0; }"
    assert rows[2]["code"] == "plain &lt; escaped"


def test_math_spans_verbatim(spark):
    """MathML inner XML and TeX between $$/\\(/\\[ delimiters come
    through verbatim with internal spacing; alttext only on mathml;
    whitespace-only math drops; idx orders within each kind."""
    from webx.metadata import math_spans

    html = (
        b'<math alttext="a+b"><mi>a</mi><mo>+</mo><mi>b</mi></math>'
        b"<p>then $$ x =\n  y $$ and $$z$$ and \\(k<2\\) and \\[ Q \\]</p>"
        b"<p>empty $$  $$</p>"
    )
    pages = spark.createDataFrame([("u", html)], "url string, html binary")
    rows = {(r["kind"], r["idx"]): r for r in math_spans(pages).collect()}
    assert set(rows) == {
        ("mathml", 0), ("display", 0), ("display", 1),
        ("inline", 0), ("bracket", 0),
    }
    assert rows[("mathml", 0)]["math"] == "<mi>a</mi><mo>+</mo><mi>b</mi>"
    assert rows[("mathml", 0)]["alttext"] == "a+b"
    assert rows[("display", 0)]["math"] == " x =\n  y "
    assert rows[("display", 1)]["math"] == "z"
    assert rows[("inline", 0)]["math"] == "k<2"
    assert rows[("bracket", 0)]["math"] == " Q "


def test_template_fingerprint_content_independent(spark):
    """Pages from one template share the fingerprint regardless of
    text; a structurally different page gets another; tag case does
    not matter; n_tags counts open+close tags."""
    from webx.metadata import template_fingerprint

    t = lambda body: f"<html><body><p>{body}</p></body></html>".encode()
    pages = spark.createDataFrame(
        [
            ("a", t("first article text")),
            ("b", t("totally different words here")),
            ("c", b"<HTML><BODY><P>upper case markup</P></BODY></HTML>"),
            ("d", b"<html><body><div><p>extra div</p></div></body></html>"),
        ],
        "url string, html binary",
    )
    got = {r["url"]: (r["template_fp"], r["n_tags"])
           for r in template_fingerprint(pages).collect()}
    assert got["a"] == got["b"] == got["c"]
    assert got["d"] != got["a"]
    assert got["a"][1] == 6 and got["d"][1] == 8


def test_publish_dates_lanes_and_precedence(spark):
    """Every lane wins when higher lanes are absent; a malformed
    higher-priority value falls THROUGH instead of blanking the row;
    both meta attribute orders parse; 1-digit URL months zero-pad."""
    from webx.metadata import publish_dates

    meta = b'<meta property="article:published_time" content="2024-03-05T08:00:00Z">'
    meta_rev = b'<meta content="2024-03-06" property="article:published_time">'
    jsonld = (
        b'<script type="application/ld+json">'
        b'{"@type":"Article","datePublished":"2024-04-07T00:00:00Z"}</script>'
    )
    tme = b'<time datetime="2024-05-09">x</time>'
    bad_meta = b'<meta property="article:published_time" content="yesterday">'
    wrap = lambda *parts: b"<html><body>" + b"".join(parts) + b"</body></html>"
    pages = spark.createDataFrame(
        [
            ("https://a/1", wrap(meta, jsonld, tme)),
            ("https://a/2", wrap(meta_rev)),
            ("https://a/3", wrap(jsonld, tme)),
            ("https://a/4", wrap(tme)),
            ("https://a/2023/7/4/post", wrap()),
            ("https://a/6", wrap(bad_meta, jsonld)),  # malformed falls through
            ("https://a/7", wrap()),
        ],
        "url string, html binary",
    )
    got = {
        r["url"]: (r["publish_date"], r["publish_date_source"])
        for r in publish_dates(pages).collect()
    }
    assert got["https://a/1"] == ("2024-03-05", "meta")
    assert got["https://a/2"] == ("2024-03-06", "meta")
    assert got["https://a/3"] == ("2024-04-07", "jsonld")
    assert got["https://a/4"] == ("2024-05-09", "time")
    assert got["https://a/2023/7/4/post"] == ("2023-07-04", "url")
    assert got["https://a/6"] == ("2024-04-07", "jsonld")
    assert got["https://a/7"] == ("", "")
