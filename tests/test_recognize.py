"""Stage-2 decoder micro-goldens (RecCTCLabelDecode-analog round-trips,
modeled on the reference's rec_postprocess.py:252-267 inline asserts)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from webx.charset import decode_bytes, sniff_charset
from webx.entities import unescape
from webx.recognize import decode_span


def test_plain_text():
    assert decode_span(b"hello world", "utf-8") == "hello world"


def test_inline_tags_stripped():
    assert decode_span(b"a <b>bold</b> c", "utf-8") == "a bold c"


def test_block_tags_become_newlines():
    assert decode_span(b"<h1>Title</h1><p>Body text</p>", "utf-8") == "Title\nBody text"


def test_empty_lines_dropped():
    assert decode_span(b"<p>a</p><p>  </p><p>b</p>", "utf-8") == "a\nb"


def test_whitespace_collapse():
    assert decode_span(b"a   b\t\tc", "utf-8") == "a b c"


def test_script_content_dropped():
    assert decode_span(b"x<script>var y = '<p>no</p>';</script>z", "utf-8") == "x z"


def test_comment_dropped():
    assert decode_span(b"x<!-- <b>hidden</b> -->y", "utf-8") == "x y"


def test_entities():
    assert unescape("&amp;&lt;&gt;&quot;&apos;") == "&<>\"'"
    assert unescape("&#65;&#x42;&#X43;") == "ABC"
    assert unescape("&hellip;&mdash;&nbsp;") == "…— "
    assert unescape("&bogusref;&#xD800;&#0;") == "&bogusref;&#xD800;&#0;"
    assert unescape("no entities") == "no entities"


def test_decode_span_entities():
    assert decode_span(b"Fish &amp; chips &lt;tag&gt;", "utf-8") == "Fish & chips <tag>"


def test_latin1_decode():
    raw = "café".encode("latin-1")
    assert decode_span(raw, "latin-1") == "café"


def test_invalid_utf8_replacement_deterministic():
    out = decode_span(b"ab\xff\xfecd", "utf-8")
    assert out == "ab��cd"


def test_crlf_normalized():
    assert decode_span(b"a\r\nb\rc", "utf-8") == "a\nb\nc"


# ---- charset sniffing ----

def test_sniff_meta_charset():
    # WHATWG registry: the iso-8859-1/latin1/ascii label family IS
    # windows-1252 on the web
    assert sniff_charset(b'<meta charset="ISO-8859-1">') == "cp1252"
    assert sniff_charset(b"<meta charset=latin1>") == "cp1252"
    assert sniff_charset(b"<meta charset=ascii>") == "cp1252"
    assert sniff_charset(b"<meta charset=gb2312>") == "gbk"
    assert sniff_charset(b"<meta charset=sjis>") == "cp932"
    assert sniff_charset(b"<meta charset=euc-kr>") == "cp949"
    assert (
        sniff_charset(b'<meta http-equiv="Content-Type" content="text/html; charset=windows-1252">')
        == "cp1252"
    )


def test_sniff_whatwg_prescan_rules():
    # a charset decl inside a comment never counts
    assert (
        sniff_charset(b'<!-- <meta charset="koi8-r"> --><meta charset="utf-8">')
        == "utf-8"
    )
    assert sniff_charset(b'<!-- <meta charset="koi8-r"> --><p>x</p>') == "utf-8"
    # an unterminated comment hides everything after it
    assert sniff_charset(b'<!-- oops <meta charset="koi8-r">') == "utf-8"
    # content= form requires the http-equiv=content-type pragma
    assert sniff_charset(b'<meta content="text/html; charset=koi8-r">') == "utf-8"
    # a declared UTF-16 on ASCII-shaped bytes resolves to UTF-8 (spec 9.4)
    assert sniff_charset(b'<meta charset="utf-16le">') == "utf-8"
    # charset= in a non-meta tag never counts
    assert sniff_charset(b'<a href="/x?charset=koi8-r">k</a>') == "utf-8"
    # x-user-defined is a real label
    assert sniff_charset(b'<meta charset="x-user-defined">') == "x-user-defined"


def test_sniff_default_and_unknown():
    assert sniff_charset(b"<html><p>x</p>") == "utf-8"
    assert sniff_charset(b'<meta charset="not-a-codec-xx">') == "utf-8"


def test_sniff_only_first_1024_bytes():
    html = b"x" * 2000 + b'<meta charset="iso-8859-1">'
    assert sniff_charset(html) == "utf-8"


def test_decode_bytes_fallback_chain():
    assert decode_bytes(b"abc", "utf-8") == ("abc", "ok", "utf-8")
    # ascii-invalid but utf-8-valid -> fallback to utf-8, flagged
    text, status, codec = decode_bytes("café".encode("utf-8"), "ascii")
    assert (text, status, codec) == ("café", "charset_fallback", "utf-8")
    # total fallback latin-1 never fails
    text, status, codec = decode_bytes(b"\xff\xfe", "utf-8")
    assert status == "charset_fallback" and codec == "latin-1" and len(text) == 2


def test_html5_entity_coverage():
    # stdlib-backed table: accented letters, greek, arrows, math
    assert unescape("&ouml;&Uuml;&szlig;") == "öÜß"
    assert unescape("&alpha;&Omega;&rarr;&infin;") == "αΩ→∞"
    assert unescape("&NonBreakingSpace;") == " "  # policy override


# ---- sniff_charset fast paths vs the full WHATWG prescan


_META_FRAGS = st.sampled_from(
    [
        b'<meta charset="utf-8">', b'<meta charset="utf-8"/>',
        b'<meta charset="utf-8" >', b"<meta charset=utf-8>",
        b'<meta charset="UTF-8">', b'<META CHARSET="utf-8">',
        b'<meta charset="iso-8859-1">', b'<meta charset="utf-16le">',
        b'<meta http-equiv="content-type" content="text/html; charset=koi8-r">',
        b'<meta name="viewport" content="width=device-width">',
        b"<!--", b"-->", b"<!-- <meta charset=\"gbk\"> -->",
        b"<head>", b"</head>", b"<title>t</title>", b" ", b"\n",
        b"<meta", b">", b'"', b"'", b"/>", b"x" * 40,
        b'<meta charset="utf-8" x="unterminated',
    ]
)


@settings(max_examples=400, deadline=None)
@given(st.lists(_META_FRAGS, max_size=12))
def test_sniff_fast_path_differential(parts):
    """sniff_charset (with fast paths) must equal the raw WHATWG
    prescan on meta/comment soup, for both default charsets."""
    from webx.charset import _sniff_prescan, sniff_charset

    html = b"".join(parts)
    for default in ("utf-8", "cp1252"):
        assert sniff_charset(html, default) == _sniff_prescan(
            html[:1024], default
        )


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=300))
def test_sniff_fast_path_raw_bytes(html):
    from webx.charset import _sniff_prescan, sniff_charset

    assert sniff_charset(html) == _sniff_prescan(html[:1024], "utf-8")


# ---- <pre>/<listing> whitespace preservation -------------------------

import pandas as pd

from webx.config import ExtractConfig
from webx.extract import extract_batch
from webx.recognize import decode_span_pre, pre_regions


def _ext(html: bytes, ck: str = "auto") -> str:
    out = extract_batch(
        pd.DataFrame({"url": ["u"], "html": [html]}),
        ExtractConfig(ckernels=ck),
    )
    return out.iloc[0]["text"]


_PRE_DOC = (
    b"<article><h1>Quickstart</h1>"
    b"<p>Install the package and run the watcher over your sources.</p>"
    b"<pre><code>$ veldt init\n    indented  line\n\ttabbed\tcells</code></pre>"
    b"<p>Exit codes follow the usual convention for command tools.</p>"
    b"</article>"
)


def test_pre_preserves_indent_tabs_and_double_spaces():
    text = _ext(_PRE_DOC)
    assert "$ veldt init\n    indented  line\n\ttabbed\tcells" in text
    # surrounding prose still collapses normally
    assert "Install the package and run the watcher" in text


def test_pre_python_and_c_paths_agree():
    assert _ext(_PRE_DOC, "off") == _ext(_PRE_DOC, "require")


def test_pre_regions_island_precedence():
    html = (
        b"<!-- <pre>not real</pre> -->"
        b"<script>var x = '<pre>fake</pre>';</script>"
        b"<pre>real <!-- </pre> hidden close --> content</pre>tail"
    )
    regs = pre_regions(html)
    assert len(regs) == 1
    s, e = regs[0]
    assert html[s:e] == b"real <!-- </pre> hidden close --> content"


def test_pre_unclosed_runs_to_eof():
    html = b"<pre>line one\n  line two"
    (s, e), = pre_regions(html)
    assert html[s:e] == b"line one\n  line two"


def test_pre_self_closed_opens_no_region():
    assert pre_regions(b"<pre/>no region here") == ()


def test_listing_region_preserved():
    html = (
        b"<article><p>A paragraph of ordinary prose long enough to "
        b"score as a candidate block here.</p>"
        b"<listing>cols  a   b\n  row 1</listing></article>"
    )
    assert "cols  a   b\n  row 1" in _ext(html)


def test_pre_entities_decode_but_spacing_stays():
    html = (
        b"<article><p>Comparison operators decode inside the sample "
        b"block below as usual.</p>"
        b"<pre>if (i &lt; j)  { total += rows[i]; }</pre></article>"
    )
    assert "if (i < j)  { total += rows[i]; }" in _ext(html)


def test_pre_edge_blank_lines_trimmed_interior_kept():
    html = (
        b"<article><p>Ordinary prose paragraph long enough to be kept "
        b"as a candidate.</p><pre>\n\n  first\n\n  second\n\n</pre></article>"
    )
    text = _ext(html)
    assert "  first\n\n  second" in text
    assert "\n\n  first" not in text  # leading blank lines trimmed


def test_pre_crlf_normalized_only():
    html = (
        b"<article><p>Ordinary prose paragraph long enough to be kept "
        b"as a candidate.</p><pre>a  b\r\n  c</pre></article>"
    )
    assert "a  b\n  c" in _ext(html)


def test_standalone_pre_span_starting_inside_region():
    # no surrounding prose: the span BEGINS at the pre content (block
    # offsets are text-trimmed past the open tag) — the region
    # intersection must still preserve it
    html = b"<pre>$ run --all --verbose\n    keep  this   spacing  intact</pre>"
    text = _ext(html)
    assert text == "$ run --all --verbose\n    keep  this   spacing  intact"


def test_decode_span_pre_partitions_normal_and_preserved():
    html = b"<p>before   text</p><pre>in  side</pre><p>after   text</p>"
    regs = pre_regions(html)
    out = decode_span_pre(html, "utf-8", 0, regs)
    assert out == "before text\nin  side\nafter text"

def test_pre_prefix_named_tags_are_not_opens():
    # r5 ADVICE fix: <prefix-box>/<presentation>/<listing-item> must not
    # match the pre/listing open branch — before the name boundary a doc
    # with a real <pre> plus a prefix-named tag grew a bogus region to EOF
    html = (
        b"<pre>code block</pre>"
        b"<prefix-box>hello   world   this should collapse</prefix-box>"
    )
    regs = pre_regions(html)
    assert len(regs) == 1
    s, e = regs[0]
    assert html[s:e] == b"code block"


def test_pre_prefix_named_tags_alone_no_probe_region():
    # <presentation>/<listing-item> without any real pre: the open branch
    # must not fire even when the cheap probe passes via "<pre" prefix
    html = b"<presentation>a   b</presentation><listing-item>c</listing-item>"
    # probe matches b"<pre" via <presentation>? probe requires [\s/>] after
    # the name, so it should miss entirely — and scan must agree
    assert pre_regions(html) == ()


def test_pre_open_with_attrs_still_matches():
    html = b'<pre class="code" data-lang="py">x  =  1</pre>'
    (s, e), = pre_regions(html)
    assert html[s:e] == b"x  =  1"
