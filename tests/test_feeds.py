from __future__ import annotations

from webx.feeds import parse_feed, parse_sitemap


def _df(spark, rows):
    return spark.createDataFrame(
        [(u, x.encode("utf-8")) for u, x in rows], "url string, xml binary"
    )


ATOM = (
    '<?xml version="1.0"?><feed xmlns="http://www.w3.org/2005/Atom">'
    "<title>My Blog</title>"
    "<entry><title>First  post</title>"
    '<link rel="alternate" href="https://b.example/1"/>'
    "<updated>2024-01-01T00:00:00Z</updated></entry>"
    "<entry><title>Second</title>"
    '<link href="https://b.example/2"/>'
    "<updated>2024-01-02T03:04:05Z</updated></entry>"
    "</feed>"
)

RSS = (
    '<?xml version="1.0"?><rss version="2.0"><channel>'
    "<title>News</title><link>https://n.example/</link>"
    "<item><title>Story</title><link>https://n.example/s1</link>"
    "<pubDate>Mon, 01 Jan 2024 00:00:00 GMT</pubDate></item>"
    "<item><title>Undated</title><link>https://n.example/s2</link>"
    "<pubDate>not a date</pubDate></item>"
    "<item><title>No day-of-week</title><link>https://n.example/s3</link>"
    "<pubDate>02 Jan 2024 00:00:00 +0000</pubDate></item>"
    "</channel></rss>"
)


def test_parse_atom(spark):
    rows = (
        parse_feed(_df(spark, [("f", ATOM)])).orderBy("entry_idx").collect()
    )
    assert [r["source_format"] for r in rows] == ["atom", "atom"]
    assert [r["title"] for r in rows] == ["First post", "Second"]
    assert [r["link"] for r in rows] == [
        "https://b.example/1",
        "https://b.example/2",
    ]
    assert rows[0]["pub_epoch"] == 1704067200
    assert rows[1]["pub_epoch"] == 1704164645


def test_parse_rss_with_optional_day_of_week_and_bad_date(spark):
    rows = parse_feed(_df(spark, [("f", RSS)])).orderBy("entry_idx").collect()
    assert [r["source_format"] for r in rows] == ["rss"] * 3
    assert rows[0]["pub_epoch"] == 1704067200
    assert rows[1]["pub_epoch"] is None  # fail-soft, not a task failure
    assert rows[2]["pub_epoch"] == 1704153600  # day-of-week omitted: legal
    assert rows[0]["link"] == "https://n.example/s1"


def test_parse_feed_mixed_batch(spark):
    out = parse_feed(_df(spark, [("a", ATOM), ("r", RSS)]))
    kinds = {r["url"]: r["source_format"] for r in out.collect()}
    assert kinds == {"a": "atom", "r": "rss"}
    assert out.count() == 5


SITEMAP = (
    '<?xml version="1.0"?><urlset>'
    "<url><loc>https://s.example/a</loc><lastmod>2024-01-15</lastmod>"
    "<changefreq>Daily</changefreq><priority>0.8</priority></url>"
    "<url><loc> https://s.example/b </loc></url>"
    "</urlset>"
)


def test_parse_sitemap_fields_and_defaults(spark):
    rows = (
        parse_sitemap(_df(spark, [("sm", SITEMAP)])).orderBy("url_idx").collect()
    )
    assert rows[0]["loc"] == "https://s.example/a"
    assert rows[0]["lastmod"] == "2024-01-15"
    assert rows[0]["changefreq"] == "daily"
    assert rows[0]["priority"] == 0.8
    assert rows[1]["loc"] == "https://s.example/b"  # trimmed
    assert rows[1]["lastmod"] == ""
    assert rows[1]["priority"] is None  # omitted: frontier decides


def test_parse_sitemap_empty(spark):
    assert parse_sitemap(_df(spark, [("sm", "<urlset></urlset>")])).count() == 0


SITEMAP_INDEX = (
    '<?xml version="1.0" encoding="UTF-8"?>\n'
    '<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
    "<sitemap><loc> https://s.example/sm1.xml </loc>"
    "<lastmod>2024-02-01</lastmod></sitemap>"
    "<sitemap><loc>https://s.example/sm2.xml</loc></sitemap>"
    "</sitemapindex>"
)


def test_sitemap_kind_classifies_root_element(spark):
    """index vs urlset vs anything else — prolog, namespace attrs, and
    case must not confuse the root test."""
    from pyspark.sql import functions as F

    from webx.feeds import sitemap_kind

    rows = [
        ("i", SITEMAP_INDEX, "index"),
        ("u", SITEMAP, "urlset"),
        ("U", '<?xml version="1.0"?><URLSET>x</URLSET>', "urlset"),
        ("h", "<html><body>nope", "unknown"),
        ("e", "", "unknown"),
    ]
    got = {
        r["url"]: r["kind"]
        for r in _df(spark, [(u, x) for u, x, _ in rows])
        .select("url", sitemap_kind("xml").alias("kind"))
        .collect()
    }
    assert got == {u: k for u, _, k in rows}


def test_parse_sitemap_index_children(spark):
    """One row per child <sitemap>: loc trimmed, lastmod '' when the
    block omits it; a urlset document yields no child rows."""
    from webx.feeds import parse_sitemap_index

    rows = (
        parse_sitemap_index(_df(spark, [("i", SITEMAP_INDEX), ("u", SITEMAP)]))
        .orderBy("sm_idx")
        .collect()
    )
    assert [(r["url"], r["sm_idx"], r["loc"], r["lastmod"]) for r in rows] == [
        ("i", 0, "https://s.example/sm1.xml", "2024-02-01"),
        ("i", 1, "https://s.example/sm2.xml", ""),
    ]
