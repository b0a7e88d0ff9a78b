"""HTML entity table + unescape — the char-dictionary analog.

The reference maps index→char through dictionary files loaded once
(mindocr/utils/dict/, loaded at mindocr/postprocess/rec_postprocess.py:42-48);
we map entity→char through a fixed table plus numeric references. The table
is a module constant: broadcast-free (it ships with the --py-files zip) and
immutable, so decode is deterministic everywhere.
"""

from __future__ import annotations

import re

NAMED = {
    "amp": "&",
    "lt": "<",
    "gt": ">",
    "quot": '"',
    "apos": "'",
    "nbsp": " ",  # policy: non-breaking space → plain space (documented)
    "copy": "©",
    "reg": "®",
    "trade": "™",
    "mdash": "—",
    "ndash": "–",
    "hellip": "…",
    "lsquo": "‘",
    "rsquo": "’",
    "ldquo": "“",
    "rdquo": "”",
    "laquo": "«",
    "raquo": "»",
    "middot": "·",
    "bull": "•",
    "deg": "°",
    "euro": "€",
    "pound": "£",
    "yen": "¥",
    "cent": "¢",
    "sect": "§",
    "para": "¶",
    "plusmn": "±",
    "times": "×",
    "divide": "÷",
    "frac12": "½",
    "frac14": "¼",
}

_ENT_RE = re.compile(r"&(?:#[xX]([0-9a-fA-F]{1,6})|#([0-9]{1,7})|([a-zA-Z][a-zA-Z0-9]{1,31}));")


def _sub(m: re.Match) -> str:
    hx, dec, name = m.groups()
    if hx is not None:
        cp = int(hx, 16)
    elif dec is not None:
        cp = int(dec)
    else:
        return NAMED.get(name, m.group(0))
    if 0 < cp <= 0x10FFFF and not (0xD800 <= cp <= 0xDFFF):
        return chr(cp)
    return m.group(0)


def unescape(text: str) -> str:
    """Resolve named + numeric character references; unknown refs pass through."""
    if "&" not in text:
        return text
    return _ENT_RE.sub(_sub, text)
