"""Source round-trips: WARC and binaryFile → pages schema → extraction."""

from __future__ import annotations

import gzip
from datetime import datetime, timezone

from pyspark.sql import functions as F

from webx.config import ExtractConfig
from webx.pipeline import run_extraction
from webx.sources import parse_warc, read_binary_files, read_warc, write_warc

PAGE = (
    b"<html><body><nav><li><a href='/'>Home</a></li></nav>"
    b"<p>The main paragraph body with plenty of characters to detect.</p>"
    b"</body></html>"
)
TS = datetime(2026, 1, 2, 3, 4, 5, tzinfo=timezone.utc)


def records(n=5):
    return [(f"https://ex.com/{i}", TS, PAGE + b"<!--%d-->" % i) for i in range(n)]


def test_warc_roundtrip_pure():
    raw = write_warc(records())
    got = parse_warc(raw)
    assert len(got) == 5
    for i, (url, ts, html) in enumerate(got):
        assert url == f"https://ex.com/{i}"
        assert ts == TS
        assert html == PAGE + b"<!--%d-->" % i


def test_warc_gzip_and_garbage():
    raw = gzip.compress(write_warc(records(3)))
    assert len(parse_warc(raw)) == 3
    assert parse_warc(b"not a warc at all") == []
    # truncated record: parse what's complete, skip the rest
    full = write_warc(records(2))
    assert len(parse_warc(full[: len(full) - 40])) >= 1


def test_warc_non_response_records_skipped():
    body = b"software: test"
    rec = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: "
        + str(len(body)).encode()
        + b"\r\n\r\n"
        + body
        + b"\r\n\r\n"
    )
    raw = rec + write_warc(records(1))
    got = parse_warc(raw)
    assert len(got) == 1 and got[0][0] == "https://ex.com/0"


def test_read_warc_distributed_and_extract(spark, tmp_path):
    (tmp_path / "a.warc").write_bytes(write_warc(records(4)))
    (tmp_path / "b.warc").write_bytes(write_warc(
        [(f"https://ex.com/b{i}", TS, PAGE) for i in range(3)]
    ))
    pages = read_warc(spark, str(tmp_path))
    assert pages.count() == 7
    out = run_extraction(pages, ExtractConfig())
    rows = out.collect()
    assert len(rows) == 7
    assert all(
        r["text"] == "The main paragraph body with plenty of characters to detect."
        for r in rows
    )
    ts = pages.select("warc_ts").first()[0]
    assert ts.year == 2026 and ts.second == 5


def test_read_binary_files(spark, tmp_path):
    for i in range(3):
        (tmp_path / f"p{i}.html").write_bytes(PAGE)
    (tmp_path / "skip.txt").write_bytes(b"nope")
    pages = read_binary_files(spark, str(tmp_path))
    assert pages.count() == 3
    out = run_extraction(pages, ExtractConfig())
    assert out.filter(F.col("text") != "").count() == 3


def test_warc_per_record_gzip_members():
    """Common-Crawl style: each record its own gzip member, concatenated."""
    import gzip

    raw = write_warc(records(3))
    parts = [p for p in raw.split(b"WARC/1.0") if p]
    members = b"".join(gzip.compress(b"WARC/1.0" + p) for p in parts)
    got = parse_warc(members)
    assert [u for u, _, _ in got] == [f"https://ex.com/{i}" for i in range(3)]
