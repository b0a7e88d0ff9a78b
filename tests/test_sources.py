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


def _warc_record(rtype: bytes, uri: bytes, date: bytes, body: bytes) -> bytes:
    hdr = (
        b"WARC/1.0\r\nWARC-Type: " + rtype + b"\r\n"
        b"WARC-Record-ID: <urn:uuid:0000>\r\n"
        + (b"WARC-Target-URI: " + uri + b"\r\n" if uri else b"")
        + b"WARC-Date: " + date + b"\r\n"
        b"Content-Length: " + str(len(body)).encode() + b"\r\n"
    )
    return hdr + b"\r\n" + body + b"\r\n\r\n"


def test_warc_common_crawl_shapes():
    """A CC-faithful archive: warcinfo + request/response/metadata
    triplets, fractional-second WARC-Dates, a chunked response, and a
    bare-LF HTTP header block — only the two payloads come out."""
    date = b"2017-10-24T00:14:32.000Z"
    info = _warc_record(b"warcinfo", b"", date, b"software: crawler\r\n")
    req = _warc_record(
        b"request", b"http://a.example/x", date,
        b"GET /x HTTP/1.1\r\nHost: a.example\r\n\r\n",
    )
    # chunked response: payload '<p>hello world</p>' in two chunks
    chunked = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        b"Transfer-Encoding: chunked\r\n\r\n"
        b"9;ext=1\r\n<p>hello \r\n9\r\nworld</p>\r\n0\r\n\r\n"
    )
    resp1 = _warc_record(b"response", b"http://a.example/x", date, chunked)
    meta = _warc_record(b"metadata", b"http://a.example/x", date, b"fetchTimeMs: 7\r\n")
    # bare-LF HTTP headers (server emitted LF only); WARC framing still CRLF
    lf_http = b"HTTP/1.1 200 OK\nContent-Type: text/html\n\n<p>lf page</p>"
    resp2 = _warc_record(b"response", b"<http://b.example/y>", date, lf_http)
    recs = parse_warc(info + req + resp1 + meta + resp2)
    assert [(u, h) for u, _, h in recs] == [
        ("http://a.example/x", b"<p>hello world</p>"),
        ("http://b.example/y", b"<p>lf page</p>"),
    ]
    assert recs[0][1] == datetime(2017, 10, 24, 0, 14, 32, tzinfo=timezone.utc)


def test_warc_chunked_framing_errors_fail_soft():
    from webx.sources import _dechunk

    assert _dechunk(b"zz\r\nnothex") == b"zz\r\nnothex"  # bad size token
    assert _dechunk(b"ff\r\nshort") == b"ff\r\nshort"    # size beyond end
    assert _dechunk(b"5\r\nhello\r\n0\r\n\r\n") == b"hello"
    # trailer headers after the 0 chunk are not content
    assert _dechunk(b"3\r\nabc\r\n0\r\nX-T: 1\r\n\r\n") == b"abc"


def test_corrupt_parquet_file_tolerance(spark, tmp_path):
    """Operational robustness: one garbage file in a 10^5-file dataset
    must not kill the scan when ignoreCorruptFiles is on — and MUST
    kill it when off (silent data loss is opt-in, never default)."""
    import pytest

    p = str(tmp_path / "mixed")
    spark.range(100).write.parquet(p)
    with open(f"{p}/part-junk.parquet", "wb") as fh:
        fh.write(b"this is not a parquet file")
    with pytest.raises(Exception):
        spark.read.parquet(p).count()
    old = spark.conf.get("spark.sql.files.ignoreCorruptFiles", "false")
    try:
        spark.conf.set("spark.sql.files.ignoreCorruptFiles", "true")
        assert spark.read.parquet(p).count() == 100
    finally:
        spark.conf.set("spark.sql.files.ignoreCorruptFiles", old)


def test_warc_content_encoding_gzip_and_deflate():
    """Real crawl captures store payloads as transmitted: gzip and
    deflate Content-Encodings must be reversed; a chunked+gzip stack
    dechunks first (transfer coding wraps content coding)."""
    import gzip as _gz
    import zlib as _zl

    date = b"2017-10-24T00:14:32.000Z"
    page = b"<p>compressed page body</p>"
    gz_http = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        b"Content-Encoding: gzip\r\n\r\n" + _gz.compress(page)
    )
    zl_http = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        b"Content-Encoding: deflate\r\n\r\n" + _zl.compress(page)
    )
    # raw deflate (no zlib wrapper) — the widespread server bug
    raw_deflate = _zl.compressobj(wbits=-_zl.MAX_WBITS)
    rd = raw_deflate.compress(page) + raw_deflate.flush()
    rd_http = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        b"Content-Encoding: deflate\r\n\r\n" + rd
    )
    gz_payload = _gz.compress(page)
    chunked_gz = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        b"Content-Encoding: gzip\r\nTransfer-Encoding: chunked\r\n\r\n"
        + hex(len(gz_payload))[2:].encode() + b"\r\n" + gz_payload + b"\r\n0\r\n\r\n"
    )
    recs = parse_warc(
        _warc_record(b"response", b"http://e.com/gz", date, gz_http)
        + _warc_record(b"response", b"http://e.com/zl", date, zl_http)
        + _warc_record(b"response", b"http://e.com/rd", date, rd_http)
        + _warc_record(b"response", b"http://e.com/cg", date, chunked_gz)
    )
    assert [(u, h) for u, _, h in recs] == [
        ("http://e.com/gz", page),
        ("http://e.com/zl", page),
        ("http://e.com/rd", page),
        ("http://e.com/cg", page),
    ]


def test_warc_content_encoding_fail_soft():
    """Unknown codings (br) and corrupt streams keep bytes untouched —
    the explicit bad-row policy, no record loss."""
    date = b"2017-10-24T00:14:32.000Z"
    br_http = (
        b"HTTP/1.1 200 OK\r\nContent-Encoding: br\r\n\r\n" + b"\x0b\x01\x80junk"
    )
    corrupt = (
        b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\n" + b"not gzip at all"
    )
    ident = (
        b"HTTP/1.1 200 OK\r\nContent-Encoding: identity\r\n\r\n" + b"<p>plain</p>"
    )
    recs = parse_warc(
        _warc_record(b"response", b"http://e.com/br", date, br_http)
        + _warc_record(b"response", b"http://e.com/bad", date, corrupt)
        + _warc_record(b"response", b"http://e.com/id", date, ident)
    )
    assert [(u, h) for u, _, h in recs] == [
        ("http://e.com/br", b"\x0b\x01\x80junk"),
        ("http://e.com/bad", b"not gzip at all"),
        ("http://e.com/id", b"<p>plain</p>"),
    ]


def test_warc_content_encoding_valid_header_corrupt_body():
    """A VALID gzip header with a corrupt deflate body raises zlib.error
    (not OSError) from gzip.decompress — routine in truncated captures;
    the payload must come through untouched, never kill the batch."""
    import gzip as _gz

    date = b"2017-10-24T00:14:32.000Z"
    good = _gz.compress(b"<p>ok</p>")
    corrupt_body = good[:10] + b"\xff\xfe\xfd\xfc"  # header ok, body junk
    truncated = good[: len(good) // 2]  # mid-stream cut → EOFError
    recs = parse_warc(
        _warc_record(
            b"response", b"http://e.com/c", date,
            b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\n" + corrupt_body,
        )
        + _warc_record(
            b"response", b"http://e.com/t", date,
            b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\n" + truncated,
        )
    )
    assert [(u, h) for u, _, h in recs] == [
        ("http://e.com/c", corrupt_body),
        ("http://e.com/t", truncated),
    ]


def test_warc_gz_archive_corrupt_or_truncated_never_raises():
    """A .warc.gz whose gzip member is truncated (EOFError) or corrupt
    past the header (zlib.error) ends the scan empty — never raises."""
    import gzip as _gz

    date = b"2017-10-24T00:14:32.000Z"
    whole = _gz.compress(
        _warc_record(b"response", b"http://e.com/", date,
                     b"HTTP/1.1 200 OK\r\n\r\n<p>x</p>")
    )
    assert parse_warc(whole[: len(whole) // 2]) == []          # truncated
    assert parse_warc(whole[:10] + b"\xff\xfe\xfd\xfc") == []  # corrupt body
    from webx.sources import parse_wet

    assert parse_wet(whole[: len(whole) // 2]) == []
    assert parse_wet(whole[:10] + b"\xff\xfe\xfd\xfc") == []


def test_warc_revisit_records_roundtrip():
    """Revisit layout: first capture of a body is a response, later
    identical captures are digest-only revisit records; the plain
    reader still sees only responses."""
    from webx.sources import parse_warc_records, payload_digest, write_warc_revisits

    ts = datetime(2020, 1, 1, tzinfo=timezone.utc)
    recs = [
        ("http://a.com/1", ts, b"<p>body one</p>"),
        ("http://a.com/2", ts, b"<p>body two</p>"),
        ("http://b.com/1-copy", ts, b"<p>body one</p>"),
    ]
    raw = write_warc_revisits(recs)
    got = parse_warc_records(raw)
    assert [(k, u) for k, u, _, _, _ in got] == [
        ("response", "http://a.com/1"),
        ("response", "http://a.com/2"),
        ("revisit", "http://b.com/1-copy"),
    ]
    assert got[2][3] == got[0][3] == payload_digest(b"<p>body one</p>")
    assert got[2][4] == b""
    assert [(u, h) for u, _, h in parse_warc(raw)] == [
        ("http://a.com/1", b"<p>body one</p>"),
        ("http://a.com/2", b"<p>body two</p>"),
    ]


def test_resolve_revisits_across_files(spark, tmp_path):
    """The digest join resolves a revisit whose response lives in a
    DIFFERENT archive file; dangling digests drop (fail-soft)."""
    from webx.sources import (
        payload_digest,
        read_warc_records,
        resolve_revisits,
        write_warc_revisits,
    )

    ts = datetime(2020, 1, 1, tzinfo=timezone.utc)
    body = b"<p>shared body</p>"
    # file 1: the stored response; file 2: a revisit of it + a dangling one
    (tmp_path / "a.warc").write_bytes(
        write_warc_revisits([("http://a.com/orig", ts, body)])
    )
    f2 = write_warc_revisits([("http://a.com/orig", ts, body),
                              ("http://b.com/copy", ts, body)])
    # drop file 2's response record, keep only its revisit
    f2_revisit_only = f2[f2.index(b"WARC/1.0", 1):]
    dangling = (
        b"WARC/1.0\r\nWARC-Type: revisit\r\n"
        b"WARC-Target-URI: http://c.com/ghost\r\n"
        b"WARC-Date: 2020-01-01T00:00:00Z\r\n"
        b"WARC-Payload-Digest: sha1:NOSUCHDIGEST\r\n"
        b"Content-Length: 0\r\n\r\n\r\n\r\n"
    )
    (tmp_path / "b.warc").write_bytes(f2_revisit_only + dangling)
    records = read_warc_records(spark, str(tmp_path / "*.warc"))
    got = sorted(
        (r.url, bytes(r.html)) for r in resolve_revisits(records).collect()
    )
    assert got == [
        ("http://a.com/orig", body),
        ("http://b.com/copy", body),
    ]


def test_warc_truncated_tail_member_keeps_prior_records():
    """A shard whose LAST gzip member is cut mid-stream (routine on
    real crawl transfers) must still yield every record from the
    complete members — not drop the whole file."""
    import gzip as _gz

    good = _gz.compress(write_warc(records(3)))
    tail = _gz.compress(write_warc(records(2)))
    blob = good + tail[: len(tail) // 2]
    from webx.sources import _warc_walk

    n = sum(1 for _ in _warc_walk(blob))
    assert n == sum(1 for _ in _warc_walk(_gz.compress(write_warc(records(3)))))
    assert n >= 3


def test_warc_corrupt_middle_member_keeps_prefix():
    """A corrupt member ends the scan at the member boundary; records
    before it survive."""
    import gzip as _gz

    from webx.sources import _warc_walk

    good = _gz.compress(write_warc(records(2)))
    bad = bytearray(_gz.compress(write_warc(records(2))))
    bad[12] ^= 0xFF  # corrupt the deflate body
    n_all = sum(1 for _ in _warc_walk(good + bytes(bad)))
    n_good = sum(1 for _ in _warc_walk(good))
    assert n_all >= n_good


# ---- WAT (metadata-envelope container) ----


def wat_records(n=3):
    return [
        (
            f"https://ex.com/{i}",
            TS,
            f"Title {i}",
            ["/", "/products", f"/r/{i}"],
        )
        for i in range(n)
    ]


def test_wat_roundtrip_pure():
    from webx.sources import parse_wat, write_wat

    raw = b"".join(write_wat(wat_records()))
    got = parse_wat(raw)
    assert len(got) == 3
    for i, (url, ts, title, links) in enumerate(got):
        assert url == f"https://ex.com/{i}"
        assert ts == TS
        assert title == f"Title {i}"
        assert links == ["/", "/products", f"/r/{i}"]  # document order kept


def test_wat_gzip_members_and_damage():
    from webx.sources import parse_wat, write_wat

    recs = write_wat(wat_records(4))
    # CC layout: one gzip member per record; a corrupt tail member
    # costs only its own record (shared _warc_walk damage policy).
    tail = bytearray(gzip.compress(recs[3]))
    tail[12] ^= 0xFF
    raw = b"".join(gzip.compress(r) for r in recs[:3]) + bytes(tail)
    got = parse_wat(raw)
    assert [u for u, *_ in got] == [f"https://ex.com/{i}" for i in range(3)]
    # truncated mid-member tail: same outcome
    t2 = gzip.compress(recs[3])
    raw2 = b"".join(gzip.compress(r) for r in recs[:3]) + t2[: len(t2) // 2]
    assert len(parse_wat(raw2)) == 3


def test_wat_skips_warcinfo_and_bad_json():
    from webx.sources import parse_wat, write_wat

    info = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 2\r\n\r\nok\r\n\r\n"
    )
    bad_body = b"{not json"
    bad = (
        b"WARC/1.0\r\nWARC-Type: metadata\r\n"
        b"WARC-Target-URI: https://ex.com/bad\r\n"
        b"Content-Length: " + str(len(bad_body)).encode() + b"\r\n\r\n"
        + bad_body + b"\r\n\r\n"
    )
    raw = info + bad + b"".join(write_wat(wat_records(1)))
    got = parse_wat(raw)
    assert len(got) == 1 and got[0][0] == "https://ex.com/0"


def test_read_wat_distributed(spark, tmp_path):
    from webx.sources import read_wat, write_wat

    for f, n in (("a.wat.gz", 3), ("b.wat.gz", 2)):
        recs = write_wat(wat_records(n))
        (tmp_path / f).write_bytes(b"".join(gzip.compress(r) for r in recs))
    df = read_wat(spark, str(tmp_path / "*.wat.gz"))
    rows = df.orderBy("url").collect()
    assert len(rows) == 5
    assert rows[0].links == ["/", "/products", "/r/0"]
    assert rows[0].title == "Title 0"
    assert rows[0].wat_ts == TS.replace(tzinfo=None)


def test_write_wat_dir_roundtrip(spark, tmp_path):
    from webx.sources import read_wat, write_wat_dir

    df = spark.createDataFrame(
        [(u, t.replace(tzinfo=None), ti, ls) for u, t, ti, ls in wat_records(6)],
        "url string, wat_ts timestamp, title string, links array<string>",
    )
    shards = write_wat_dir(df.repartition(3), str(tmp_path / "wat"))
    assert sum(n for _, n in shards) == 6
    back = read_wat(spark, str(tmp_path / "wat" / "part-*.wat.gz"))
    got = {r.url: (r.title, list(r.links)) for r in back.collect()}
    assert got == {
        u: (ti, ls) for u, _, ti, ls in wat_records(6)
    }


# ---- HTTP header surfacing + request records ----


def test_parse_warc_http_headers():
    from webx.sources import parse_warc_http, write_warc

    def hdrs(i, url):
        if i == 0:
            return [("X-Robots-Tag", "noindex, nofollow")]
        if i == 1:
            return [("Last-Modified", "Wed, 01 Jan 2026 00:00:00 GMT")]
        return []

    raw = write_warc(records(3), headers_fn=hdrs)
    got = parse_warc_http(raw, ("x-robots-tag", "last-modified"))
    assert [(v[0], v[1]) for _, _, _, v in got] == [
        ("noindex, nofollow", ""),
        ("", "Wed, 01 Jan 2026 00:00:00 GMT"),
        ("", ""),
    ]
    # payloads unharmed by the extra headers
    assert all(h == PAGE + b"<!--%d-->" % i for i, (_, _, h, _) in enumerate(got))


def test_warc_headers_survive_content_encoding():
    from webx.sources import parse_warc_http, write_warc

    raw = write_warc(
        records(3),
        content_encoding="mixed",
        headers_fn=lambda i, url: [("X-Robots-Tag", f"tag{i}")],
    )
    got = parse_warc_http(raw, ("x-robots-tag",))
    assert [v[0] for *_, v in got] == ["tag0", "tag1", "tag2"]
    # gzip (i=1) and deflate (i=2) payloads still decode
    assert all(h == PAGE + b"<!--%d-->" % i for i, (_, _, h, _) in enumerate(got))


def test_read_warc_http_distributed(spark, tmp_path):
    from webx.sources import read_warc_http, write_warc

    raw = write_warc(
        records(4),
        headers_fn=lambda i, u: [("X-Robots-Tag", "noindex")] if i % 2 else [],
    )
    (tmp_path / "a.warc").write_bytes(raw)
    df = read_warc_http(spark, str(tmp_path / "a.warc"), names=("x-robots-tag",))
    rows = df.orderBy("url").collect()
    assert [r.x_robots_tag for r in rows] == ["", "noindex", "", "noindex"]


def test_warc_requests_roundtrip(spark, tmp_path):
    from webx.sources import (
        parse_warc_requests,
        read_warc_requests,
        write_warc_requests,
    )

    reqs = [(f"https://ex.com/{i}", TS) for i in range(5)]
    raw = write_warc_requests(reqs)
    assert [u for u, _ in parse_warc_requests(raw)] == [u for u, _ in reqs]
    # request records are invisible to the response readers and vice versa
    from webx.sources import parse_warc

    assert parse_warc(raw) == []
    mixed = raw + write_warc(records(2))
    assert len(parse_warc_requests(mixed)) == 5
    assert len(parse_warc(mixed)) == 2
    (tmp_path / "r.warc.gz").write_bytes(gzip.compress(raw))
    got = read_warc_requests(spark, str(tmp_path / "r.warc.gz")).collect()
    assert len(got) == 5 and got[0].req_ts == TS.replace(tzinfo=None)


def test_sniff_mime_edges(spark):
    from webx.sources import sniff_mime

    cases = [
        (b"\xef\xbb\xbf  \t\n<HtMl><body>", "text/html"),  # BOM + ws + case
        (b"<!-- hello --><p>x", "text/html"),
        (b"<p>paragraph", "text/html"),
        (b"%PDF-1.7 <html>", "application/pdf"),  # magic outranks tag
        (b"%!PS-Adobe-3.0", "application/postscript"),
        (b"RIFF\x00\x00\x00\x00WEBPVP8 ", "image/webp"),
        (b"RIFF\x00\x00\x00\x00WAVEfmt ", "application/octet-stream"),
        (b"\x00\x00\x00\x18ftypmp42", "video/mp4"),
        (b"OggS\x00\x02", "application/ogg"),
        (b"BM\x3a\x00", "image/bmp"),
        (b"just some readme text\nsecond line", "text/plain"),
        (b"binary \x00 data", "application/octet-stream"),
        # not a recognized tag -> falls through to the ASCII-text check
        (b"<plaintext but not an html tag", "text/plain"),
    ]
    df = spark.createDataFrame(
        [(i, bytearray(b)) for i, (b, _) in enumerate(cases)],
        "i int, html binary",
    )
    got = {r.i: r.mime for r in df.select("i", sniff_mime().alias("mime")).collect()}
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (i, cases[i][0], got[i], want)
