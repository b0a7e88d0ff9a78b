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
  reference mindocr/data/transforms/det_transforms.py:62-65)
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
    b"form figure figcaption fieldset legend address summary details body html head".split()
)
BOILER_TAGS = frozenset(b"nav header footer aside form noscript".split())
HEADING_TAGS = frozenset(b"h1 h2 h3 h4 h5 h6 title".split())
# Raw-text elements: content is skipped wholesale (never text).
RAWTEXT_TAGS = frozenset(b"script style textarea".split())

WS = b" \t\r\n\f\v"

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
                if boiler_depth > 0:
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
            if boiler_depth > 0:
                b_boiler = True
    # final flush
    if b_start >= 0 and b_tlen > 0:
        append(Block(b_start, b_end, b_tlen, b_link, b_tags, b_heading, b_boiler))
    return blocks
