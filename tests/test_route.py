"""Mixed-corpus routed extraction (webx/route.py): magic-byte
classification, per-lane dispatch fidelity, and order preservation."""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings, strategies as st

from webx.config import ExtractConfig
from webx.media import gif_bytes, jpeg_bytes, png_bytes, webp_bytes
from webx.pdf import write_pdf, write_pdf_encrypted
from webx.route import _routed_batch, classify_payload

CFG = ExtractConfig()

_HTML = (
    b"<!DOCTYPE html><html><body><article><p>A paragraph of ordinary "
    b"prose long enough to score as a candidate block in the detector."
    b"</p></article></body></html>"
)


def test_classify_payload():
    assert classify_payload(write_pdf("T", "B")) == "pdf"
    assert classify_payload(write_pdf_encrypted("T", "B", "aesv2")) == "pdf"
    assert classify_payload(png_bytes(2, 2)) == "image"
    assert classify_payload(gif_bytes(2, 2)) == "image"
    assert classify_payload(jpeg_bytes(2, 2)) == "image"
    assert classify_payload(webp_bytes(2, 2)) == "image"
    assert classify_payload(_HTML) == "html"
    assert classify_payload(b"  \n <html><p>x</p>") == "html"
    assert classify_payload(b"plain prose with no markup") == "other"
    assert classify_payload(b"") == "other"
    from webx.media import avif_bytes, bmp_bytes, flac_bytes, mp4_bytes, wav_bytes

    assert classify_payload(wav_bytes(8000, 1)) == "audio"
    assert classify_payload(flac_bytes(8000, 1)) == "audio"
    assert classify_payload(mp4_bytes(64, 48, 100)) == "video"
    assert classify_payload(avif_bytes(8, 8)) == "image"
    assert classify_payload(bmp_bytes(8, 8)) == "image"
    # mp3 deliberately NOT magic-routed (frame sync too weak a signature)
    from webx.media import mp3_bytes

    assert classify_payload(mp3_bytes(0, True)) == "other"


def test_routed_batch_matches_lane_kernels():
    from webx.extract import extract_batch
    from webx.pdf import parse_pdf

    rows = {
        "url": ["h", "p", "i", "o", "pe"],
        "payload": [
            _HTML,
            write_pdf("Doc 1", "Pdf body text."),
            png_bytes(77, 33),
            b"just words",
            write_pdf_encrypted("Doc 2", "Secret body.", "rc4"),
        ],
    }
    out = _routed_batch(pd.DataFrame(rows), CFG)
    assert out["kind"].tolist() == ["html", "pdf", "image", "other", "pdf"]
    flag = extract_batch(
        pd.DataFrame({"url": ["h"], "html": [_HTML]}), CFG
    ).iloc[0]["text"]
    assert out.iloc[0]["text"] == flag  # html lane == flagship
    assert out.iloc[1]["text"] == parse_pdf(rows["payload"][1])[0]
    assert (out.iloc[2]["width"], out.iloc[2]["height"]) == (77, 33)
    assert out.iloc[3]["status"] == "skipped" and out.iloc[3]["text"] is None
    assert out.iloc[4]["text"] == "Doc 2\nSecret body."


def test_broken_payloads_fail_soft_per_row():
    rows = {
        "url": ["bad-pdf", "bad-img", "good"],
        "payload": [b"%PDF-1.4 truncated", png_bytes(5, 5)[:12], _HTML],
    }
    out = _routed_batch(pd.DataFrame(rows), CFG)
    assert out.iloc[0]["status"] == "unsupported"
    assert out.iloc[1]["status"] == "unsupported"
    assert out.iloc[2]["status"] == "ok"  # neighbors unaffected


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=100))
def test_classify_total(b):
    assert classify_payload(b) in ("html", "pdf", "image", "other")
