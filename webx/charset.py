"""Deterministic charset sniffing + decode policy for raw page bytes.

Policy (SURVEY.md §7.3 "binary html with arbitrary charsets"):

1. sniff a ``charset=`` declaration in the first 1024 bytes
   (``<meta charset=...>`` or ``http-equiv`` content-type);
2. try the declared codec, then utf-8;
3. final fallback latin-1 (total — never fails), flagged
   ``charset_fallback``.

The reference's bad-sample policy is *silent random substitution*
(mindocr/data/det_dataset.py:100-102); ours is an explicit ``status``
column so bad rows are counted, never hidden.
"""

from __future__ import annotations

import codecs
import re
from typing import Tuple

# Single source for the declaration pattern: the imperative sniffing
# path compiles it over bytes; the declarative column op (urls.page_metadata)
# applies the same text as a (?i) Spark regexp. Java-regex/RE2-safe.
CHARSET_DECL_PATTERN = r"charset\s*=\s*[\"']?\s*([a-zA-Z0-9._-]+)"
_CHARSET_RE = re.compile(CHARSET_DECL_PATTERN.encode(), re.I)

_ALIASES = {
    "iso-8859-1": "latin-1",
    "iso8859-1": "latin-1",
    "windows-1252": "cp1252",
    "gb2312": "gbk",
    "utf8": "utf-8",
}


def normalize_input_bytes(html: bytes) -> bytes:
    """BOM normalization BEFORE byte-level tokenization. The lexer
    requires ASCII-transparent bytes ('<' must be one byte); UTF-16
    pages (BOM-marked) are transcoded to UTF-8 — span offsets then index
    the transcoded buffer, which IS the html the rest of the pipeline
    sees. A UTF-8 BOM is stripped (it is not content). Undecodable
    UTF-16 falls through untouched to the explicit fallback policy."""
    if html[:2] in (b"\xff\xfe", b"\xfe\xff"):
        try:
            return html.decode("utf-16").encode("utf-8")
        except UnicodeDecodeError:
            return html
    if html[:3] == b"\xef\xbb\xbf":
        return html[3:]
    return html


def sniff_charset(html: bytes, default: str = "utf-8") -> str:
    head = html[:1024]
    m = _CHARSET_RE.search(head)
    if not m:
        return default
    name = m.group(1).decode("ascii", "ignore").lower()
    name = _ALIASES.get(name, name)
    try:
        codecs.lookup(name)
    except LookupError:
        return default
    return name


def normalize_charset_name(name: str) -> "str | None":
    """Alias-normalize + validate a charset name; None when the codec
    is unknown (callers then fall back to the sniffed declaration)."""
    n = _ALIASES.get(name.lower(), name.lower())
    try:
        codecs.lookup(n)
    except LookupError:
        return None
    return n


def decode_bytes(raw: bytes, charset: str) -> Tuple[str, str, str]:
    """→ (text, status, effective_codec); status ∈ {ok, charset_fallback}.

    The effective codec is what actually decoded the bytes — span
    decoding MUST use it (not the declared charset) or a misdeclared
    page decodes as mojibake while status correctly says fallback."""
    try:
        return raw.decode(charset), "ok", charset
    except (UnicodeDecodeError, LookupError):
        pass
    if charset != "utf-8":
        try:
            return raw.decode("utf-8"), "charset_fallback", "utf-8"
        except UnicodeDecodeError:
            pass
    return raw.decode("latin-1"), "charset_fallback", "latin-1"
