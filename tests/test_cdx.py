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


def test_change_rate_schedule_estimator(spark):
    import math

    from webx.cdx import change_rate_schedule

    # url A: body changes at every capture (X=3 of n=3 comparisons);
    # url B: never changes (X=0); url C: changes once (X=1).
    rows = [
        ("A", 0, "a0"), ("A", 1, "a1"), ("A", 2, "a2"), ("A", 3, "a3"),
        ("B", 0, "b"), ("B", 1, "b"), ("B", 2, "b"), ("B", 3, "b"),
        ("C", 0, "c"), ("C", 1, "c"), ("C", 2, "c2"), ("C", 3, "c2"),
    ]
    caps = spark.createDataFrame(rows, "doc_id string, cap_idx int, body string")
    got = {
        r.doc_id: (r.n_changes, r.change_rate, r.recrawl_days)
        for r in change_rate_schedule(caps.repartition(5)).collect()
    }
    for key, x in (("A", 3), ("C", 1)):
        lam = -math.log((3 - x + 0.5) / 3.5)
        assert got[key][0] == x
        assert got[key][1] == round(lam, 6)
        assert got[key][2] == round(1.0 / lam, 6)
    # bias-corrected: the always-changing page gets a FINITE rate
    # (naive X/n would saturate); the never-changing page collapses to
    # rate 0 with recrawl_days NULL ("never recrawl", not a div/0).
    assert got["B"] == (0, 0.0, None)
    assert 0 == got["B"][1] < got["C"][1] < got["A"][1]
