"""HTML entity table + unescape — the char-dictionary analog.

The reference maps index→char through dictionary files loaded once
(mindocr/utils/dict/, loaded at mindocr/postprocess/rec_postprocess.py:42-48);
we map entity→char through a fixed table plus numeric references. The table
is a module constant: broadcast-free (it ships with the --py-files zip) and
immutable, so decode is deterministic everywhere.
"""

from __future__ import annotations

import html.entities
import re

# Full HTML5 named-entity table from the stdlib (public, frozen data),
# restricted to the canonical ';'-terminated forms — plus explicit policy
# overrides. This is the char-dictionary load
# (rec_postprocess.py:42-48) with the dict shipped in the stdlib.
NAMED = {
    name[:-1]: value
    for name, value in html.entities.html5.items()
    if name.endswith(";")
}
NAMED.update(
    {
        "nbsp": " ",   # policy: non-breaking space → plain space
        "NonBreakingSpace": " ",
    }
)

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
