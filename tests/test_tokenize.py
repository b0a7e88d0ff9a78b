"""Tokenizer micro-goldens — hand-written expected block tables, the style
of the reference's inline __main__ asserts (rec_transforms.py:386-446)."""

from __future__ import annotations

from webx.tokenize import Block, tokenize


def test_empty_and_whitespace():
    assert tokenize(b"") == []
    assert tokenize(b"   \n\t ") == []
    assert tokenize(b"<p>   </p>") == []


def test_single_paragraph_offsets():
    html = b"<p>hello world</p>"
    [b] = tokenize(html)
    assert html[b.start : b.end] == b"hello world"
    assert b.tlen == len(b"helloworld")  # non-whitespace bytes
    assert b.link_tlen == 0 and not b.boiler and not b.heading


def test_whitespace_trimmed_offsets():
    html = b"<p>  hi there \n</p>"
    [b] = tokenize(html)
    assert html[b.start : b.end] == b"hi there"


def test_block_boundary_splits_blocks():
    html = b"<p>one</p><p>two</p>"
    bs = tokenize(html)
    assert [html[b.start : b.end] for b in bs] == [b"one", b"two"]


def test_inline_tags_do_not_split():
    html = b"<p>one <b>bold</b> two</p>"
    [b] = tokenize(html)
    assert html[b.start : b.end] == b"one <b>bold</b> two"
    assert b.tag_cnt == 2  # <b> and </b>


def test_link_text_counted():
    html = b'<p>pre <a href="/x">link text</a> post</p>'
    [b] = tokenize(html)
    assert b.link_tlen == len(b"linktext")
    assert b.tlen == len(b"prelinktextpost")


def test_boiler_flag_nav_footer():
    html = b"<nav><li>Home</li></nav><p>real</p><footer><p>c</p></footer>"
    bs = tokenize(html)
    flags = [(html[b.start : b.end], b.boiler) for b in bs]
    assert flags == [(b"Home", True), (b"real", False), (b"c", True)]


def test_heading_flag():
    html = b"<h1>Title</h1><p>body</p>"
    bs = tokenize(html)
    assert [b.heading for b in bs] == [True, False]


def test_script_style_content_skipped():
    html = b'<script>var a="<p>not text</p>";</script><p>yes</p><style>p{}</style>'
    bs = tokenize(html)
    assert [html[b.start : b.end] for b in bs] == [b"yes"]


def test_unclosed_script_swallows_rest():
    html = b"<script>var a=1; <p>gone</p>"
    assert tokenize(html) == []


def test_comment_and_cdata_skipped():
    html = b"<p>a<!-- <p>no</p> -->b</p><![CDATA[ <p>x</p> ]]><p>c</p>"
    bs = tokenize(html)
    assert [html[b.start : b.end] for b in bs] == [b"a<!-- <p>no</p> -->b", b"c"]
    # the comment inside the first block counts as a tag, not text
    assert bs[0].tlen == 2


def test_attribute_with_gt_in_quotes():
    html = b'<p data-x="a>b">text</p>'
    [b] = tokenize(html)
    assert html[b.start : b.end] == b"text"


def test_doctype_and_pi_ignored():
    html = b"<!DOCTYPE html><?xml version='1.0'?><p>x</p>"
    bs = tokenize(html)
    assert [html[b.start : b.end] for b in bs] == [b"x"]


def test_self_closing_and_br():
    html = b"<p>one<br/>two</p>"
    bs = tokenize(html)
    # br is a block boundary: flushes the run
    assert [html[b.start : b.end] for b in bs] == [b"one", b"two"]


def test_nested_boiler_depth():
    html = b"<header><nav><p>x</p></nav><p>y</p></header><p>z</p>"
    bs = tokenize(html)
    assert [(html[b.start : b.end], b.boiler) for b in bs] == [
        (b"x", True),
        (b"y", True),
        (b"z", False),
    ]


def test_multibyte_utf8_offsets_are_bytes():
    html = "<p>café ok</p>".encode("utf-8")
    [b] = tokenize(html)
    assert html[b.start : b.end] == "café ok".encode("utf-8")
    # tlen counts bytes, not chars: é is 2 bytes
    assert b.tlen == len("café ok".encode("utf-8")) - 1


def test_block_is_namedtuple_contract():
    [b] = tokenize(b"<p>abc</p>")
    assert isinstance(b, Block)
    assert b._fields == ("start", "end", "tlen", "link_tlen", "tag_cnt", "heading", "boiler")


def test_table_rows_are_blocks():
    html = b"<table><tr><td>a1</td><td>a2</td></tr><tr><td>b1</td></tr></table>"
    bs = tokenize(html)
    assert [html[b.start : b.end] for b in bs] == [b"a1", b"a2", b"b1"]


def test_definition_list():
    html = b"<dl><dt>Term</dt><dd>The definition text</dd></dl>"
    bs = tokenize(html)
    assert [html[b.start : b.end] for b in bs] == [b"Term", b"The definition text"]


def test_svg_is_a_non_prose_drop_region():
    # svg is a DROP region: inline (no block split), ONE tag, and its
    # text (chart labels) contributes nothing
    html = b"<p>before <svg><text>label</text></svg> after</p>"
    [b] = tokenize(html)
    assert html[b.start : b.end] == b"before <svg><text>label</text></svg> after"
    assert b.tag_cnt == 1
    assert b.tlen == len(b"before") + len(b"after")


def test_select_options_and_button_text_dropped():
    html = (
        b"<p>Ship to <select name=c><option>Canada<option>Mexico</select>"
        b" by <button>Confirm order</button> now</p>"
    )
    [b] = tokenize(html)
    assert b.tlen == len(b"Shipto") + len(b"by") + len(b"now")
    assert b.tag_cnt == 2  # the two regions


def test_unclosed_drop_region_ends_at_block_tag():
    html = b"<p>before <svg><circle r=4/>junk<p>next paragraph</p>"
    bs = tokenize(html)
    texts = [html[b.start : b.end] for b in bs]
    assert texts == [b"before", b"next paragraph"]


def test_ruby_annotations_dropped_base_kept():
    # explicit closes, omitted closes (next <rt>/<rp>), and </ruby>
    html = "<p><ruby>漢字<rp>(</rp><rt>かんじ</rt><rp>)</rp></ruby>と<ruby>水<rt>みず</ruby>も</p>".encode()
    [b] = tokenize(html)
    assert b.tlen == len("漢字と水も".encode())


def test_selfclosing_drop_open_is_just_a_tag():
    html = b"<p>a <svg/> b <math  /> c</p>"
    [b] = tokenize(html)
    assert b.tlen == 3
    assert b.tag_cnt == 2


def test_stray_drop_close_is_inline_tag():
    html = b"<p>x </svg> y</p>"
    [b] = tokenize(html)
    assert b.tlen == 2 and b.tag_cnt == 1


def test_drop_terminator_hidden_inside_comment_and_script():
    # comment and rawtext islands hide </svg> from the region scan
    html = b"<p>a <svg><!-- </svg> --><script>'</svg>';</script>x</svg> b</p>"
    [b] = tokenize(html)
    assert b.tlen == 2  # 'a' + 'b'; the svg text 'x' never counts


def test_video_audio_fallback_dropped():
    html = (
        b"<p>clip <video controls><source src=v.mp4>Your browser does not "
        b"support the video tag.</video> here</p>"
    )
    [b] = tokenize(html)
    assert b.tlen == len(b"clip") + len(b"here")


def test_iframe_is_rawtext_fallback_never_text():
    # iframe content is raw text per the HTML spec: tags inside are not
    # parsed, text never surfaces, the element is a block boundary
    html = b"<iframe src=/ad><p>buy things</p></iframe><p>story</p>"
    bs = tokenize(html)
    assert [html[b.start : b.end] for b in bs] == [b"story"]


def test_template_content_inert():
    html = b"<template><div>row template {{x}}</div></template><p>page</p>"
    bs = tokenize(html)
    assert [html[b.start : b.end] for b in bs] == [b"page"]


def test_iframe_and_noscript():
    html = b"<p>x</p><noscript><p>js off</p></noscript><iframe src='/y'></iframe><p>z</p>"
    bs = tokenize(html)
    flagged = [(html[b.start : b.end], b.boiler) for b in bs]
    assert (b"js off", True) in flagged
    assert (b"x", False) in flagged and (b"z", False) in flagged


def test_pre_block_single():
    html = b"<pre>line one\n  line two</pre>"
    [b] = tokenize(html)
    assert html[b.start : b.end] == b"line one\n  line two"


def test_upper_and_mixed_case_tags():
    html = b"<P>one</P><Div>two</DIV><A HREF='/x'>link</A>"
    bs = tokenize(html)
    assert [html[b.start : b.end] for b in bs] == [b"one", b"two", b"link"]
    assert bs[2].link_tlen == 4


def test_unbalanced_quote_in_script_does_not_swallow_following_tag():
    """A quote construct opened inside a script body must not consume a
    real tag after </script> (the lexer re-scans from the skip point)."""
    html = b'<script>x="<i a=\x22;</script><p>A real paragraph" >more</p>'
    [b] = tokenize(html)
    assert b.start == html.index(b"A real")  # block begins AFTER the <p> tag
    assert html[b.start : b.end] == b'A real paragraph" >more'


# ---- title-as-metadata + class/id-hint boilerplate regions ----------

def test_title_blocks_are_boiler():
    html = b"<head><title>Site Name</title></head><body><p>real body text</p>"
    bs = tokenize(html)
    assert [(html[b.start : b.end], b.boiler) for b in bs] == [
        (b"Site Name", True),
        (b"real body text", False),
    ]
    assert bs[0].heading  # still flagged heading (q_page_meta reads it)


def test_unclosed_title_reset_at_body():
    """An unclosed <title> must not boiler the whole page: the region
    ends at </head> or <body> (a title cannot cross the head boundary)."""
    html = b"<head><title>never closed</head><body><p>kept prose</p>"
    bs = tokenize(html)
    flags = [(html[b.start : b.end], b.boiler) for b in bs]
    assert (b"kept prose", False) in flags


def test_class_hint_cookie_banner_region():
    html = (
        b'<div class="cookie-banner"><p>We value your privacy</p></div>'
        b"<p>article text</p>"
    )
    bs = tokenize(html)
    assert [(html[b.start : b.end], b.boiler) for b in bs] == [
        (b"We value your privacy", True),
        (b"article text", False),
    ]


def test_class_hint_positive_token_wins():
    html = b'<div class="ad content"><p>kept: positive token</p></div>'
    [b] = tokenize(html)
    assert not b.boiler


def test_class_hint_id_and_unquoted():
    html = b"<div id=newsletter><p>drop</p></div><section class=sidebar>s</section><p>k</p>"
    bs = tokenize(html)
    assert [(html[b.start : b.end], b.boiler) for b in bs] == [
        (b"drop", True),
        (b"s", True),
        (b"k", False),
    ]


def test_class_hint_not_fooled_by_other_attr_value():
    """'class=banner' inside ANOTHER attribute's quoted value must not
    mark the element (sequential attr parse, not substring match)."""
    html = b'<div title="class=banner" data-x="id=ad"><p>kept</p></div>'
    [b] = tokenize(html)
    assert not b.boiler


def test_class_hint_nested_divs_depth_matched():
    """The region ends at ITS close tag: inner divs (even unbalanced
    opens that do close) stay inside; following content is free."""
    html = (
        b'<div class="promo"><div><p>inner drop</p></div><p>also drop</p></div>'
        b"<p>free again</p>"
    )
    bs = tokenize(html)
    assert [(html[b.start : b.end], b.boiler) for b in bs] == [
        (b"inner drop", True),
        (b"also drop", True),
        (b"free again", False),
    ]


def test_class_hint_stray_close_benign():
    html = b'</div><div class="ads"><p>x</p></div><p>y</p>'
    bs = tokenize(html)
    assert [(html[b.start : b.end], b.boiler) for b in bs] == [
        (b"x", True),
        (b"y", False),
    ]


def test_class_hint_token_boundaries():
    # "topnav" is ONE token — not the "nav" token; no region
    html = b'<div class="topnav"><p>kept</p></div>'
    [b] = tokenize(html)
    assert not b.boiler
    # hyphen splits: "so-cial" != social; "share-bar" → {share, bar} hits
    html2 = b'<div class="share-bar"><p>drop</p></div>'
    [b2] = tokenize(html2)
    assert b2.boiler


def test_class_hint_only_div_and_section():
    # conservative scope: a <table class="nav"> is NOT a hint region
    html = b'<table class="nav"><tr><td>cell text</td></tr></table>'
    [b] = tokenize(html)
    assert not b.boiler


# ---- raw-kept elements: <xmp> / <plaintext> (+ <listing> as block) ---

def test_xmp_is_one_raw_block_tags_literal():
    html = b"<p>before</p><xmp>Use <b>bold</b> &amp; raw</xmp><p>after</p>"
    bs = tokenize(html)
    assert [html[b.start : b.end] for b in bs] == [
        b"before",
        b"Use <b>bold</b> &amp; raw",
        b"after",
    ]
    raw = bs[1]
    assert raw.tag_cnt == 0  # markup bytes inside are literal text
    assert raw.tlen == len(b"Use <b>bold</b> &amp; raw".replace(b" ", b""))


def test_plaintext_runs_to_eof():
    html = b"<p>x</p><plaintext>rest <p>is</p> raw forever"
    bs = tokenize(html)
    assert [html[b.start : b.end] for b in bs] == [
        b"x",
        b"rest <p>is</p> raw forever",
    ]
    assert bs[1].tag_cnt == 0


def test_listing_parses_like_pre():
    html = b"<listing>shown <b>parsed</b></listing><p>z</p>"
    bs = tokenize(html)
    # extent trims to the last TEXT byte (the trailing </b> is a tag)
    assert [html[b.start : b.end] for b in bs] == [b"shown <b>parsed", b"z"]
    assert bs[0].tag_cnt == 2  # <b>/</b> parsed as tags, unlike xmp


def test_xmp_inherits_boiler_and_link_context():
    html = b"<nav><xmp>chrome sample</xmp></nav><a><xmp>linked</xmp></a>"
    bs = tokenize(html)
    assert bs[0].boiler and not bs[1].boiler
    assert bs[1].link_tlen == bs[1].tlen


def test_xmp_decode_keeps_entities_and_tags():
    import pandas as pd
    from webx.config import ExtractConfig
    from webx.extract import extract_batch

    html = (
        b"<html><body><h1>Raw text demo heading</h1>"
        b"<p>The paragraph before the example is normal prose with &amp; decoding.</p>"
        b"<xmp>literal <tags> stay &amp; entities do not decode</xmp>"
        b"<p>The paragraph after keeps flowing as entirely normal prose.</p>"
        b"</body></html>"
    )
    for mode in ("auto", "off"):
        out = extract_batch(
            pd.DataFrame({"url": ["u"], "html": [html]}), ExtractConfig(ckernels=mode)
        ).iloc[0]["text"]
        assert "literal <tags> stay &amp; entities do not decode" in out, mode
        assert "normal prose with & decoding." in out, mode


def test_invisible_format_chars_stripped_joiners_kept():
    """The _INVIS_RE policy (webx/recognize.py): presentation-only
    format chars vanish; orthographic joiners survive. Both kernel
    modes — the chars are never ASCII, so the fused C path must bail
    to the identical Python normalize either way."""
    import pandas as pd
    from webx.config import ExtractConfig
    from webx.extract import extract_batch

    html = (
        "<html><body><p>A hy­phen and com&shy;pound term plus a "
        "zero​width gap, ‫bidi‬ ⁦controls⁩, "
        "the⁠joiner, a stray ﻿ bom, kept Persian "
        "می‌خواهم and emoji "
        "\U0001f468‍\U0001f469‍\U0001f467 in one honest "
        "paragraph long enough to score as content for the gates."
        "</p></body></html>"
    ).encode("utf-8")
    expected = (
        "A hyphen and compound term plus a zerowidth gap, bidi "
        "controls, thejoiner, a stray bom, kept Persian "
        "می‌خواهم and emoji "
        "\U0001f468‍\U0001f469‍\U0001f467 in one honest "
        "paragraph long enough to score as content for the gates."
    )
    for mode in ("auto", "off"):
        out = extract_batch(
            pd.DataFrame({"url": ["u"], "html": [html]}), ExtractConfig(ckernels=mode)
        ).iloc[0]["text"]
        assert out == expected, (mode, out)


def test_invisible_only_line_drops():
    """A block whose text is ONLY invisible chars must vanish entirely
    (strip runs before line trim, so the emptied line is dropped)."""
    import pandas as pd
    from webx.config import ExtractConfig
    from webx.extract import extract_batch

    html = (
        "<html><body>"
        "<p>The first real paragraph carries enough prose to pass every "
        "density gate the classifier applies to candidate blocks.</p>"
        "<p>​­﻿⁠</p>"
        "<p>The closing paragraph also reads as genuine article prose "
        "with no markup tricks of any kind involved at all.</p>"
        "</body></html>"
    ).encode("utf-8")
    out = extract_batch(
        pd.DataFrame({"url": ["u"], "html": [html]}), ExtractConfig()
    ).iloc[0]["text"]
    lines = out.split("\n")
    assert len(lines) == 2, lines
    assert lines[0].startswith("The first") and lines[1].startswith("The closing")


def test_nfc_flag_composes_spans():
    """ExtractConfig(nfc=True) canonically composes decoded text
    (singletons, combining sequences, Hangul jamo); the default leaves
    the as-decoded bytes frozen. ASCII is NFC-invariant so the fused C
    path needs no twin — both kernel modes must agree."""
    import unicodedata
    import pandas as pd
    from webx.config import ExtractConfig
    from webx.extract import extract_batch
    from webx.synth import NFC_LINE, NFC_SRC

    html = (
        "<html><body><p>"
        + NFC_SRC
        + " This sentence pads the paragraph over every density gate."
        "</p></body></html>"
    ).encode("utf-8")
    pdf = pd.DataFrame({"url": ["u"], "html": [html]})
    for mode in ("auto", "off"):
        raw = extract_batch(pdf, ExtractConfig(ckernels=mode)).iloc[0]["text"]
        nfc = extract_batch(
            pdf, ExtractConfig(ckernels=mode, nfc=True)
        ).iloc[0]["text"]
        assert raw.startswith(NFC_SRC), mode          # default: untouched
        assert nfc.startswith(NFC_LINE[:-1]), mode    # composed
        assert unicodedata.is_normalized("NFC", nfc), mode
        assert not unicodedata.is_normalized("NFC", raw), mode
