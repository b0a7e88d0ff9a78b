"""PDF stream-filter lanes: LZWDecode (both EarlyChange values, width
boundaries, table-clear cycles), ASCII85Decode, ASCIIHexDecode, and
/Filter chains — the text-bearing filters of older real-web PDFs
(reference parity: the transform registry dispatches by name the same
way, mindocr/data/transforms/transforms_factory.py:43)."""

from __future__ import annotations

import random

import pytest

from webx import pdf as P

GOLD = "Title X\nBody text of the page, long enough to matter."


def _pack9(codes):
    """Independent 9-bit-only packer for hand-traced vectors."""
    buf = bits = 0
    out = bytearray()
    for c in codes:
        buf = (buf << 9) | c
        bits += 9
        while bits >= 8:
            bits -= 8
            out.append((buf >> bits) & 0xFF)
    if bits:
        out.append((buf << (8 - bits)) & 0xFF)
    return bytes(out)


def test_lzw_hand_traced_vector():
    # "AAABBB": clear, 'A', AA(258), 'B', BB(260), EOD — traced by hand
    codes = [256, 65, 258, 66, 260, 257]
    assert P._lzw_decode(_pack9(codes)) == b"AAABBB"
    assert P._lzw_encode(b"AAABBB") == _pack9(codes)


def test_lzw_kwkwk_case():
    # 'ababab...' forces the code == next_code (KwKwK) branch
    data = b"ab" * 40
    assert P._lzw_decode(P._lzw_encode(data)) == data


@pytest.mark.parametrize("early", [0, 1])
def test_lzw_roundtrip_across_width_boundaries(early):
    rng = random.Random(1234 + early)
    for n in (0, 1, 7, 300, 900, 5000, 60_000, 150_000):
        for nsym in (2, 8, 256):
            data = bytes(rng.randrange(nsym) for _ in range(n))
            assert P._lzw_decode(P._lzw_encode(data, early), early) == data
    # compressible text long enough to force 12-bit table clears
    txt = b"the quick brown fox jumps over the lazy dog " * 3000
    assert P._lzw_decode(P._lzw_encode(txt, early), early) == txt


def test_lzw_eod_less_stream_tolerated():
    enc = P._lzw_encode(b"hello world hello world")
    # strip the EOD code region: decoder must return what it has
    out = P._lzw_decode(enc)
    assert out == b"hello world hello world"


def test_ascii85_whitespace_z_and_terminator():
    import base64

    data = b"\x00\x00\x00\x00some page text\x00\x00\x00\x00"
    enc = base64.a85encode(data)
    assert b"z" in enc  # zero-group shortcut present
    sprinkled = b"\n ".join(enc[i : i + 10] for i in range(0, len(enc), 10))
    assert P._ascii85_decode(sprinkled + b"~>") == data
    assert P._ascii85_decode(enc) == data  # terminator optional


def test_asciihex_odd_digit_and_ws():
    assert P._asciihex_decode(b"48 65 6c 6C 6f>") == b"Hello"
    # odd trailing digit implies a 0 (spec): '7' → 0x70
    assert P._asciihex_decode(b"48 65 7>") == b"Hep"


def test_decode_stream_filter_chain():
    import base64
    import zlib

    raw = b"chained stream payload"
    data = base64.a85encode(zlib.compress(raw)) + b"~>"
    filt = [("name", "ASCII85Decode"), ("name", "FlateDecode")]
    assert P._decode_stream(data, filt, None) == raw


def test_decode_stream_unknown_filter_raises():
    with pytest.raises(ValueError):
        P._decode_stream(b"x", ("name", "DCTDecode"), None)


@pytest.mark.parametrize(
    "lane", ["flate", "raw", "lzw", "lzw0", "a85flate", "ahx"]
)
def test_write_parse_roundtrip_all_lanes(lane):
    pdfb = P.write_pdf(
        "Title X", "Body text of the page, long enough to matter.",
        stream_filter=lane,
    )
    text, spans = P.parse_pdf(pdfb)
    assert text == GOLD
    assert spans


def test_lzw_pdf_with_long_body():
    # body long enough that the content stream crosses the 9→10 bit
    # boundary inside the document (the bug class this file pins down)
    body = " ".join(f"word{i % 37} token{i % 11}" for i in range(400))
    for lane in ("lzw", "lzw0"):
        pdfb = P.write_pdf("Doc 314", body, stream_filter=lane)
        text, _ = P.parse_pdf(pdfb)
        assert text == "Doc 314\n" + body
