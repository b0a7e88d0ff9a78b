"""lxml-free HTML byte-stream tokenizer → per-document block table.

The ``DecodeImage`` analog (reference
mindocr/data/transforms/general_transforms.py:17-53): raw bytes become the
structured intermediate the detector scores. We scan the *bytes* directly
(tags are pure ASCII; in utf-8 / latin-1 / gbk / shift-jis trail bytes never
collide with ``<``), so every offset we emit is a byte offset into the
original ``html`` column — the polygon-coordinate analog
(reference mindocr/data/transforms/det_transforms.py:69-72).

A *block* is a maximal run of text between block-level tag boundaries,
annotated with the features stage 1 scores:

``(start, end, tlen, link_tlen, tag_cnt, heading, boiler)``

* ``start``/``end`` — byte extent trimmed to non-whitespace
* ``tlen`` — non-whitespace text bytes
* ``link_tlen`` — non-whitespace text bytes inside ``<a>``
* ``tag_cnt`` — inline (non-block) tags inside the block
* ``heading`` — emitted inside ``h1..h6`` / ``title``
* ``boiler`` — emitted inside ``nav/header/footer/aside/form/noscript``
  (structural ignore-regions, the ignore-tag analog of
  reference mindocr/data/transforms/det_transforms.py:62-65), inside
  ``title`` (head metadata, never body content — q_page_meta surfaces
  it as a field), or inside a ``div``/``section`` whose ``class``/``id``
  tokens mark it boilerplate (cookie banners, share bars, newsletter
  prompts — the class-hint analog of readability.js's public
  ``unlikelyCandidates``/``okMaybeItsACandidate`` heuristic)
"""

from __future__ import annotations

import re
from typing import List, NamedTuple


class Block(NamedTuple):
    start: int
    end: int
    tlen: int
    link_tlen: int
    tag_cnt: int
    heading: bool
    boiler: bool


# Block-level elements: opening OR closing one flushes the current block.
BLOCK_TAGS = frozenset(
    b"p div h1 h2 h3 h4 h5 h6 li ul ol dl dt dd table thead tbody tfoot tr td th "
    b"br hr article section header footer nav aside main blockquote pre title "
    b"form figure figcaption fieldset legend address summary details body html head "
    b"listing".split()
)
BOILER_TAGS = frozenset(b"nav header footer aside form noscript".split())
HEADING_TAGS = frozenset(b"h1 h2 h3 h4 h5 h6 title".split())
# Raw-text elements: content is skipped wholesale (never text).
# script/style/textarea are the classic set; iframe is parsed with the
# raw-text algorithm per the HTML spec (its content is fallback markup
# never displayed by a frame-capable client); template contents are
# inert per spec (rendered only by script cloning them), so a byte-level
# extractor drops them the same way. NOT here by reviewed policy:
# noframes (a frameset page's only textual content — fixture 25 keeps
# it) and noscript (boiler FLAG, not a skip — its text is weighed).
# Nested <template> inside <template> ends at the first close tag (a
# documented approximation; the spec nests, real pages ~never do).
RAWTEXT_TAGS = frozenset(b"script style textarea iframe template".split())
# Raw-KEPT elements (1996-era): raw text that IS displayed — tags shown
# literally, character references NOT decoded (HTML spec: xmp and
# plaintext are raw text elements; plaintext has no close tag — the rest
# of the file is its content). Each becomes ONE block with tag_cnt=0;
# stage 2 decodes the region without tag-strip or entity substitution
# (webx/recognize.py decode_span_rawkept). <listing> is NOT raw — it
# parses like <pre> (it is in BLOCK_TAGS above).
RAWKEPT_TAGS = frozenset(b"xmp plaintext".split())
# Non-prose DROP elements: content parses as markup but its text is
# never prose — svg/math foreign content (chart labels, accessibility
# <title>/<desc>, formula markup), select/datalist option lists and
# button labels (UI state, not page content), audio/video fallback
# ("your browser does not support ..."), rt/rp ruby annotations (the
# BASE text is the content; the furigana gloss duplicates it). The
# region is inline (no block flush — `<p>Sales <svg>…</svg> rose</p>`
# stays one block) and counts as ONE inline tag. It ends at the
# matching close tag or at the next block-level tag, whichever comes
# first: for svg/math that mirrors the HTML5 foreign-content breakout
# list (which is ≈ our BLOCK_TAGS); for the UI elements it bounds the
# damage of unclosed soup to the current block. rt/rp additionally end
# at `</ruby>` or a following `<rt>`/`<rp>` (their end tags are
# omissible per spec). Comments, CDATA, and raw-text islands inside the
# region hide terminators, mirroring the lexer's precedence. Self-closed
# opens (`<svg/>` — honored in foreign content) open no region. KEPT by
# reviewed policy: canvas/object fallback (may be genuine content on
# legacy pages) and <dialog> (class/id hints catch modal chrome).
DROP_TAGS = frozenset(b"svg math select button datalist audio video rt rp".split())
RUBY_ANNOT_TAGS = frozenset((b"rt", b"rp"))

WS = b" \t\r\n\f\v"

# ---- class/id-hint boilerplate regions -------------------------------
# A div/section opened with a class or id containing one of these tokens
# (and none of the positive tokens) is a boilerplate region until its
# matching close tag: cookie/consent banners, share bars, newsletter
# prompts, ad units, old-web div-chrome. The lists follow readability.js's
# public unlikelyCandidates / okMaybeItsACandidate heuristic, minus
# comment-section tokens — this repo's reviewed policy KEEPS comment
# sections (tests/test_realistic_pages.py:47-49); filtering them is a
# downstream quality-model decision. Tokens are maximal [a-z0-9]+ runs of
# the lowercased attribute value: class="cookie-banner" → {cookie, banner}.
NEG_CLASS_TOKENS = frozenset(
    b"ad ads advert advertisement adsense agegate banner breadcrumb breadcrumbs "
    b"consent cookie cookies foot footer gdpr header masthead menu modal nav "
    b"navbar navigation newsletter overlay pager pagination paywall popup promo "
    b"related rss share sharebar sharing sidebar signup skyscraper social "
    b"sponsor sponsored subscribe subscription widget".split()
)
# Any positive token anywhere in the element's class/id wins (the
# okMaybeItsACandidate override): class="article-header" stays content.
POS_CLASS_TOKENS = frozenset(
    b"article body column content entry main post story".split()
)
_MAX_HINT_STACK = 64   # nested marked regions tracked (C kernel mirror)
_NAME_STOP = frozenset(b" \t\r\n\f\v=/\"'")
_WS_SET = frozenset(WS)
_ALNUM = frozenset(
    b"abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
)


def class_hint_boiler(attrs: bytes) -> bool:
    """True iff the tag's ``class``/``id`` tokens mark it boilerplate:
    some negative token present and no positive token anywhere.

    Sequential attribute parse (names until a stop byte; values quoted
    or unquoted-until-whitespace) — NOT a regex, so a ``class=banner``
    string inside some OTHER attribute's quoted value can never match.
    webx/_ctok.c `class_hint_boiler` is the bit-identical compiled port
    (differential-fuzzed, tests/test_ctokenize.py)."""
    n = len(attrs)
    i = 0
    neg = False
    while i < n:
        if attrs[i] in _NAME_STOP:
            i += 1
            continue
        j = i + 1
        while j < n and attrs[j] not in _NAME_STOP:
            j += 1
        name = attrs[i:j]
        i = j
        while i < n and attrs[i] in _WS_SET:
            i += 1
        val = b""
        if i < n and attrs[i] == 0x3D:  # '='
            i += 1
            while i < n and attrs[i] in _WS_SET:
                i += 1
            if i < n and attrs[i] in (0x22, 0x27):  # quoted value
                q = attrs[i]
                k = attrs.find(q, i + 1)
                if k < 0:
                    val = attrs[i + 1 :]
                    i = n
                else:
                    val = attrs[i + 1 : k]
                    i = k + 1
            else:  # unquoted value: until whitespace
                k = i
                while k < n and attrs[k] not in _WS_SET:
                    k += 1
                val = attrs[i:k]
                i = k
        if val and (name == b"class" or name == b"id" or name.lower() in (b"class", b"id")):
            m = len(val)
            k = 0
            while k < m:
                if val[k] in _ALNUM:
                    j2 = k + 1
                    while j2 < m and val[j2] in _ALNUM:
                        j2 += 1
                    tok = val[k:j2].lower()
                    k = j2
                    if tok in POS_CLASS_TOKENS:
                        return False
                    if tok in NEG_CLASS_TOKENS:
                        neg = True
                else:
                    k += 1
    return neg

# One regex pass over the bytes: comments, CDATA, doctype/PI, or a tag.
# Attribute values may contain '>' inside quotes.
_TAG_RE = re.compile(
    rb"<(?:"
    rb"!--.*?(?:--\s*>|\Z)"               # comment (unterminated: to EOF)
    rb"|!\[CDATA\[.*?\]\]>"                # CDATA
    rb"|[!?][^>]*>"                        # doctype / processing instruction
    rb"|(/?)([a-zA-Z][a-zA-Z0-9:_-]*)"     # 1: closing slash, 2: tag name
    rb"((?:[^>\"']|\"[^\"]*\"|'[^']*')*)"  # 3: attributes (quote-aware)
    rb"/?>"
    rb")",
    re.S,
)


def _rawtext_end(html: bytes, name: bytes, pos: int) -> int:
    """Byte offset just past ``</name...>`` starting the search at pos."""
    close = re.compile(rb"</" + re.escape(name) + rb"(?:\s[^>]*)?>", re.I)
    m = close.search(html, pos)
    return m.end() if m else len(html)


def _rawkept_end(html: bytes, name: bytes, pos: int) -> "tuple[int, int]":
    """(content_end, resume_pos) for a raw-kept element opened at pos:
    content ends at the '<' of ``</name...>``, scanning resumes past it;
    unclosed → both are len(html) (same convention as _rawtext_end)."""
    close = re.compile(rb"</" + re.escape(name) + rb"(?:\s[^>]*)?>", re.I)
    m = close.search(html, pos)
    if m is None:
        n = len(html)
        return n, n
    return m.start(), m.end()


# Drop-region scan: per drop-tag-name compiled regex over the raw bytes.
# Arms, in precedence order (the lexer's own): comment (unterminated →
# EOF), CDATA, raw-text island (open..close — terminators inside are
# hidden), the region's own close tag (group 2, consumed), a block-level
# tag open or close (group 3, NOT consumed — the main loop re-lexes it),
# and for rt/rp the ruby-specific omitted-end-tag boundaries (group 3 as
# well). webx/_ctok.c `drop_end` is the bit-identical compiled port.
# Boundary set = BLOCK_TAGS minus <title>: the HTML5 foreign-content
# breakout list does not include title, and `<svg><title>` is the
# standard accessibility pattern — terminating there would leak the
# chart's a11y text AND open a bogus head-metadata region mid-body.
_BLOCK_ALT = b"|".join(sorted(BLOCK_TAGS - {b"title"}))
_RAWTEXT_ALT = b"|".join(sorted(RAWTEXT_TAGS))


def _drop_scan_re(name: bytes) -> "re.Pattern[bytes]":
    # tag names are case-insensitive; the CDATA literal is NOT (the main
    # lexer's memcmp/_TAG_RE arm is exact) — scope (?i:) per arm
    boundary = rb"</?(?:" + _BLOCK_ALT + rb")(?=[\s/>])"
    if name in RUBY_ANNOT_TAGS:
        boundary += rb"|</ruby(?=[\s/>])|<r[tp](?=[\s/>])"
    return re.compile(
        rb"<!--.*?(?:--\s*>|\Z)|<!\[CDATA\[.*?\]\]>"
        rb"|(?i:<(" + _RAWTEXT_ALT + rb")(?:\s[^>]*)?>.*?</\1(?:\s[^>]*)?>)"
        rb"|(?i:(</" + re.escape(name) + rb"(?:\s[^>]*)?>))"
        rb"|(?i:(" + boundary + rb"))",
        re.S,
    )


_DROP_SCAN_RES = {name: _drop_scan_re(name) for name in DROP_TAGS}


def _drop_end(html: bytes, lname: bytes, pos: int) -> int:
    """Resume offset past a non-prose drop region opened at ``pos``:
    just past the matching close tag, AT the '<' of a boundary tag
    (left for the main loop), or len(html) when unterminated."""
    rx = _DROP_SCAN_RES[lname]
    n = len(html)
    cursor = pos
    while cursor < n:
        m = rx.search(html, cursor)
        if m is None:
            return n
        if m.group(2) is not None:
            return m.end()
        if m.group(3) is not None:
            return m.start()
        cursor = max(m.end(), cursor + 1)  # skipped island
    return n


def tokenize(html: bytes) -> List[Block]:
    """Scan raw page bytes into the ordered block table.

    Deterministic and tuned: one compiled-regex pass with the per-segment
    and per-tag work inlined into the loop (C-level ``bytes`` ops,
    ``translate`` for whitespace-free length, no closure dispatch — this
    loop is ~80% of pipeline CPU, see PLANS.md). Offsets index ``html``.
    """
    blocks: List[Block] = []
    append = blocks.append
    n = len(html)

    # current-block accumulators (inlined; reset after each flush)
    b_start = -1
    b_end = -1
    b_tlen = 0
    b_link = 0
    b_tags = 0
    b_heading = False
    b_boiler = False

    a_depth = 0
    boiler_depth = 0
    heading_depth = 0
    title_depth = 0        # <title> is head metadata, never body content
    div_depth = 0
    sect_depth = 0
    hint_stack: list = []  # (tag name, depth at open) of class-hint regions

    pos = 0
    search = _TAG_RE.search
    # search(html, pos) rather than finditer: after a raw-text skip the
    # lexer MUST re-scan from `pos` — a quote construct opened inside a
    # script body can otherwise swallow a real tag that follows the
    # </script> (finditer's internal cursor would have passed it)
    while True:
        m = search(html, pos)
        if m is None:
            break
        seg_end = m.start()
        if seg_end > pos:
            # ---- emit text segment [pos, seg_end) ----
            seg = html[pos:seg_end]
            stripped = seg.strip(WS)
            if stripped:
                tl = len(stripped.translate(None, WS))
                if b_start < 0:
                    b_start = pos + (len(seg) - len(seg.lstrip(WS)))
                b_end = seg_end - (len(seg) - len(seg.rstrip(WS)))
                b_tlen += tl
                if a_depth > 0:
                    b_link += tl
                if heading_depth > 0:
                    b_heading = True
                if boiler_depth > 0 or title_depth > 0:
                    b_boiler = True
        pos = m.end()
        slash, name = m.group(1, 2)
        if name is None:  # comment / CDATA / doctype / PI
            b_tags += 1
            continue
        lname = name if name.islower() else name.lower()
        if lname in BLOCK_TAGS:
            # ---- flush current block ----
            if b_start >= 0 and b_tlen > 0:
                append(Block(b_start, b_end, b_tlen, b_link, b_tags, b_heading, b_boiler))
            b_start = -1
            b_end = -1
            b_tlen = 0
            b_link = 0
            b_tags = 0
            b_heading = False
            b_boiler = False
            closing = slash == b"/"
            if lname in BOILER_TAGS:
                boiler_depth = max(0, boiler_depth - 1) if closing else boiler_depth + 1
            if lname in HEADING_TAGS:
                heading_depth = max(0, heading_depth - 1) if closing else heading_depth + 1
                if lname == b"title":
                    title_depth = max(0, title_depth - 1) if closing else title_depth + 1
            elif lname == b"div" or lname == b"section":
                if closing:
                    if lname == b"div":
                        if div_depth > 0:
                            div_depth -= 1
                        d = div_depth
                    else:
                        if sect_depth > 0:
                            sect_depth -= 1
                        d = sect_depth
                    if hint_stack and hint_stack[-1] == (lname, d):
                        hint_stack.pop()
                        boiler_depth = max(0, boiler_depth - 1)
                else:
                    d = div_depth if lname == b"div" else sect_depth
                    attrs = m.group(3)
                    if (
                        attrs
                        and len(hint_stack) < _MAX_HINT_STACK
                        and class_hint_boiler(attrs)
                    ):
                        hint_stack.append((lname, d))
                        boiler_depth += 1
                    if lname == b"div":
                        div_depth += 1
                    else:
                        sect_depth += 1
            elif lname == b"head":
                # a title region cannot cross the head boundary: an
                # unclosed <title> must not boiler the whole page
                if closing:
                    title_depth = 0
            elif lname == b"body":
                if not closing:
                    title_depth = 0
        elif lname in RAWTEXT_TAGS:
            if slash != b"/":
                pos = _rawtext_end(html, lname, pos)
            # flush (raw-text element is a hard block boundary)
            if b_start >= 0 and b_tlen > 0:
                append(Block(b_start, b_end, b_tlen, b_link, b_tags, b_heading, b_boiler))
            b_start = -1
            b_end = -1
            b_tlen = 0
            b_link = 0
            b_tags = 0
            b_heading = False
            b_boiler = False
        elif lname in RAWKEPT_TAGS:
            # flush (raw-kept element is a hard block boundary)
            if b_start >= 0 and b_tlen > 0:
                append(Block(b_start, b_end, b_tlen, b_link, b_tags, b_heading, b_boiler))
            b_start = -1
            b_end = -1
            b_tlen = 0
            b_link = 0
            b_tags = 0
            b_heading = False
            b_boiler = False
            if slash != b"/":
                if lname == b"plaintext":
                    c_end = n
                    r_end = n
                else:
                    c_end, r_end = _rawkept_end(html, lname, pos)
                # emit the raw content as its OWN block: the markup
                # bytes inside are literal text (tag_cnt stays 0)
                seg = html[pos:c_end]
                stripped = seg.strip(WS)
                if stripped:
                    tl = len(stripped.translate(None, WS))
                    s0 = pos + (len(seg) - len(seg.lstrip(WS)))
                    e0 = c_end - (len(seg) - len(seg.rstrip(WS)))
                    append(
                        Block(
                            s0,
                            e0,
                            tl,
                            tl if a_depth > 0 else 0,
                            0,
                            heading_depth > 0,
                            boiler_depth > 0 or title_depth > 0,
                        )
                    )
                pos = r_end
        elif lname in DROP_TAGS:
            # non-prose region: ONE inline tag; content contributes no
            # text (self-closed opens and stray closes are just tags)
            b_tags += 1
            if slash != b"/" and not m.group(3).endswith(b"/"):
                pos = _drop_end(html, lname, pos)
        elif lname == b"a":
            a_depth = max(0, a_depth - 1) if slash == b"/" else a_depth + 1
            b_tags += 1
        elif lname == b"noscript":
            # inline-ish but structurally boilerplate
            boiler_depth = max(0, boiler_depth - 1) if slash == b"/" else boiler_depth + 1
            b_tags += 1
        else:
            b_tags += 1
    # trailing text after the last tag
    if pos < n:
        seg = html[pos:n]
        stripped = seg.strip(WS)
        if stripped:
            tl = len(stripped.translate(None, WS))
            if b_start < 0:
                b_start = pos + (len(seg) - len(seg.lstrip(WS)))
            b_end = n - (len(seg) - len(seg.rstrip(WS)))
            b_tlen += tl
            if a_depth > 0:
                b_link += tl
            if heading_depth > 0:
                b_heading = True
            if boiler_depth > 0 or title_depth > 0:
                b_boiler = True
    # final flush
    if b_start >= 0 and b_tlen > 0:
        append(Block(b_start, b_end, b_tlen, b_link, b_tags, b_heading, b_boiler))
    return blocks
