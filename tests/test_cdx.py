"""CDXJ capture-index lane (webx/cdx.py)."""

from __future__ import annotations

from webx.cdx import latest_captures, parse_cdx, select_captures

LINE = (
    'com,example)/a 20240101000000 {"url": "https://example.com/a", '
    '"mime": "text/html", "status": "200", "digest": "AAA", '
    '"length": "1234", "offset": "5678", "filename": "c-000.warc.gz"}'
)


def _df(spark, lines):
    return spark.createDataFrame([(l,) for l in lines], "line string")


def test_parse_fields_and_epoch(spark):
    row = parse_cdx(_df(spark, [LINE])).collect()[0]
    assert row["surt_key"] == "com,example)/a"
    assert row["capture_epoch"] == 1704067200  # 2024-01-01T00:00:00Z
    assert row["url"] == "https://example.com/a"
    assert row["status"] == 200 and row["mime"] == "text/html"
    assert (row["warc_filename"], row["warc_offset"], row["warc_length"]) == (
        "c-000.warc.gz", 5678, 1234
    )


def test_malformed_lines_are_null_not_errors(spark):
    lines = [
        "garbage with no json",
        'k badts {"url": "u", "status": "200"}',  # unparseable timestamp
        'k 20240101000000 {"status": "not-a-number"}',
    ]
    rows = parse_cdx(_df(spark, lines)).collect()
    assert len(rows) == 3
    assert rows[0]["url"] is None
    assert rows[1]["capture_epoch"] is None and rows[1]["url"] == "u"
    assert rows[2]["status"] is None


def test_select_and_latest_pick(spark):
    lines = [
        LINE,
        # later capture of the same url
        'com,example)/a 20240102000000 {"url": "https://example.com/a", '
        '"mime": "text/html", "status": "200", "digest": "BBB", '
        '"length": "99", "offset": "7", "filename": "c-001.warc.gz"}',
        # non-html and non-200 captures are filtered out
        'com,example)/b 20240101000000 {"url": "https://example.com/b", '
        '"mime": "application/pdf", "status": "200", "digest": "C"}',
        'com,example)/c 20240101000000 {"url": "https://example.com/c", '
        '"mime": "text/html", "status": "404", "digest": "D"}',
    ]
    picked = latest_captures(select_captures(parse_cdx(_df(spark, lines))))
    rows = {r["url"]: r for r in picked.collect()}
    assert list(rows) == ["https://example.com/a"]
    r = rows["https://example.com/a"]
    assert r["digest"] == "BBB" and r["warc_filename"] == "c-001.warc.gz"


def test_same_second_digest_tiebreak(spark):
    a = ('k 20240101000000 {"url": "u", "mime": "text/html", '
         '"status": "200", "digest": "AAA", "filename": "f1"}')
    b = ('k 20240101000000 {"url": "u", "mime": "text/html", '
         '"status": "200", "digest": "ZZZ", "filename": "f2"}')
    for order in ([a, b], [b, a]):
        r = latest_captures(parse_cdx(_df(spark, order))).collect()[0]
        assert r["digest"] == "ZZZ"  # deterministic regardless of input order
