"""Crash-robustness fuzz for the container parsers.

parse_warc feeds mapInPandas directly (an escaped exception fails the
Spark task, not just a row), so its never-raise contract is load-bearing;
the PDF text decoder is wrapped per-row but must still terminate and only
raise its documented ValueError family. Random bytes + structured
mutations of valid fixtures."""

from __future__ import annotations

from datetime import datetime, timezone

import pytest
from hypothesis import given, settings, strategies as st

from webx.pdf import decode_text_object, parse_pdf, write_pdf, write_pdf_xrefstream
from webx.sources import parse_warc, write_warc


TS = datetime(2026, 1, 1, tzinfo=timezone.utc)
VALID_WARC = write_warc(
    [("http://e.com/a", TS, b"<p>a</p>"), ("http://e.com/b", TS, b"<p>b</p>")]
)
VALID_PDF = write_pdf("T", "body words here")
VALID_PDF_XS = write_pdf_xrefstream("T", "body words here")


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=600))
def test_parse_warc_never_raises_on_random_bytes(raw):
    out = parse_warc(raw)
    assert isinstance(out, list)


@settings(max_examples=150, deadline=None)
@given(st.integers(0, len(VALID_WARC) - 1), st.binary(min_size=1, max_size=8))
def test_parse_warc_never_raises_on_mutations(pos, junk):
    mutated = VALID_WARC[:pos] + junk + VALID_WARC[pos + len(junk):]
    out = parse_warc(mutated)
    assert isinstance(out, list)
    for url, ts, html in out:
        assert isinstance(url, str) and isinstance(html, bytes)


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=600))
def test_pdf_parse_random_bytes_fail_soft(raw):
    # parse_pdf may raise (the extract wrapper catches Exception); the
    # contract here is termination and no interpreter-level blowups.
    try:
        text, spans = parse_pdf(raw)
        assert isinstance(text, str)
    except Exception:
        pass


@settings(max_examples=200, deadline=None)
@given(
    st.sampled_from([VALID_PDF, VALID_PDF_XS]),
    st.integers(0, len(VALID_PDF) - 1),
    st.binary(min_size=1, max_size=6),
)
def test_pdf_parse_mutations_fail_soft(base, pos, junk):
    pos = pos % len(base)
    mutated = base[:pos] + junk + base[pos + len(junk):]
    try:
        text, spans = parse_pdf(mutated)
        assert isinstance(text, str)
        for a, b in spans:
            assert 0 <= a <= b
    except Exception:
        pass


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=400))
def test_pdf_content_decode_never_raises(raw):
    # the content-stream decoder is reachable with arbitrary decompressed
    # bytes (a hostile FlateDecode payload): it must never raise
    out = decode_text_object(b"BT " + raw + b" ET")
    assert isinstance(out, str)


# ---- round-4 final parsers: WAT, HTTP headers, request records ----

from webx.sources import (  # noqa: E402
    parse_warc_http,
    parse_warc_requests,
    parse_wat,
    write_wat,
    write_warc_requests,
)

VALID_WAT = b"".join(
    write_wat(
        [
            ("http://e.com/a", TS, "Title A", ["/x", "/y"]),
            ("http://e.com/b", TS, "", []),
        ]
    )
)
VALID_REQS = write_warc_requests([("http://e.com/a", TS), ("http://e.com/b", TS)])


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=600))
def test_parse_wat_never_raises_on_random_bytes(raw):
    out = parse_wat(raw)
    assert isinstance(out, list)


@settings(max_examples=150, deadline=None)
@given(st.integers(0, len(VALID_WAT) - 1), st.binary(min_size=1, max_size=8))
def test_parse_wat_never_raises_on_mutations(pos, junk):
    mutated = VALID_WAT[:pos] + junk + VALID_WAT[pos + len(junk):]
    out = parse_wat(mutated)
    assert isinstance(out, list)
    for url, _ts, title, links in out:
        assert isinstance(url, str) and isinstance(title, str)
        assert all(isinstance(x, str) for x in links)


@settings(max_examples=150, deadline=None)
@given(st.integers(0, len(VALID_WARC) - 1), st.binary(min_size=1, max_size=8))
def test_parse_warc_http_never_raises_on_mutations(pos, junk):
    mutated = VALID_WARC[:pos] + junk + VALID_WARC[pos + len(junk):]
    out = parse_warc_http(mutated, ("x-robots-tag", "last-modified"))
    assert isinstance(out, list)
    for url, _ts, html, vals in out:
        assert isinstance(url, str) and isinstance(html, bytes)
        assert len(vals) == 2 and all(isinstance(v, str) for v in vals)


@settings(max_examples=150, deadline=None)
@given(st.integers(0, len(VALID_REQS) - 1), st.binary(min_size=1, max_size=8))
def test_parse_warc_requests_never_raises_on_mutations(pos, junk):
    mutated = VALID_REQS[:pos] + junk + VALID_REQS[pos + len(junk):]
    out = parse_warc_requests(mutated)
    assert isinstance(out, list)
    for url, _ts in out:
        assert isinstance(url, str)


# ---------------------------------------------------------- encrypted PDFs

from webx.pdf import write_pdf_encrypted  # noqa: E402

VALID_PDF_RC4 = write_pdf_encrypted("T", "body words here", "rc4")
VALID_PDF_AES = write_pdf_encrypted("T", "body words here", "aesv2")
VALID_PDF_XS_ENC = write_pdf_xrefstream("T", "body words here", encrypted="aesv2")


@settings(max_examples=200, deadline=None)
@given(
    st.sampled_from([VALID_PDF_RC4, VALID_PDF_AES, VALID_PDF_XS_ENC]),
    st.integers(0, 4095),
    st.binary(min_size=1, max_size=6),
)
def test_encrypted_pdf_mutations_fail_soft(base, pos, junk):
    # byte flips anywhere — /Encrypt dict, /O //U strings, ciphertext,
    # xref — must terminate: either a clean parse or an exception the
    # extract wrapper turns into status='unsupported'; never a hang or
    # interpreter-level blowup, and never silent garbage spans
    pos = pos % len(base)
    mutated = base[:pos] + junk + base[pos + len(junk):]
    try:
        text, spans = parse_pdf(mutated)
        assert isinstance(text, str)
        for a, b in spans:
            assert 0 <= a <= b
    except Exception:
        pass
