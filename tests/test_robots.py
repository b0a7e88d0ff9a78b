"""robots.txt rule engine (webx/robots.py) — RFC 9309 semantics."""

from __future__ import annotations

import pytest

from webx.robots import crawl_delays, parse_robots, robots_gate, sitemap_urls


def _robots(spark, rows):
    return spark.createDataFrame(rows, "host string, robots_txt string")


def _pages(spark, urls):
    return spark.createDataFrame([(u,) for u in urls], "url string")


def _gate(spark, txt, urls, agent="webxbot", host="h.example.com"):
    rules = parse_robots(_robots(spark, [(host, txt)]))
    out = robots_gate(_pages(spark, urls), rules, agent=agent)
    return {r["url"]: (r["allowed"], r["matched_rule"]) for r in out.collect()}


def test_group_formation_multi_ua(spark):
    txt = (
        "User-agent: webxbot\n"
        "User-agent: otherbot\n"
        "Disallow: /doc/\n"
        "\n"
        "User-agent: *\n"
        "Disallow: /\n"
    )
    rules = parse_robots(_robots(spark, [("h", txt)])).collect()
    by_agent = {(r["agent"], r["value"]): r["group_id"] for r in rules}
    # both UA lines of group 1 carry the same rule; * is group 2
    assert by_agent[("webxbot", "/doc/")] == by_agent[("otherbot", "/doc/")] == 1
    assert by_agent[("*", "/")] == 2


def test_specific_group_overrides_star(spark):
    txt = (
        "User-agent: webxbot\nDisallow: /doc/\n\nUser-agent: *\nDisallow: /\n"
    )
    got = _gate(
        spark,
        txt,
        ["https://h.example.com/doc/1", "https://h.example.com/other"],
    )
    # webxbot's own group applies — /other is NOT blocked by the * group
    assert got["https://h.example.com/doc/1"][0] is False
    assert got["https://h.example.com/other"][0] is True


def test_longest_match_and_allow_tie(spark):
    txt = (
        "User-agent: *\n"
        "Disallow: /doc\n"
        "Allow: /doc/12\n"
        "Disallow: /x/1\n"
        "Allow: /x/1\n"
    )
    got = _gate(
        spark,
        txt,
        [
            "https://h.example.com/doc/5",    # /doc wins -> blocked
            "https://h.example.com/doc/123",  # /doc/12 longer -> allowed
            "https://h.example.com/x/1",      # equal length -> allow wins
        ],
    )
    assert got["https://h.example.com/doc/5"] == (False, "/doc")
    assert got["https://h.example.com/doc/123"] == (True, "/doc/12")
    assert got["https://h.example.com/x/1"] == (True, "/x/1")


def test_wildcard_and_dollar_anchor(spark):
    txt = "User-agent: *\nDisallow: /*.pdf$\nDisallow: /tmp/*\n"
    got = _gate(
        spark,
        txt,
        [
            "https://h.example.com/a/b.pdf",      # *.pdf$ -> blocked
            "https://h.example.com/a/b.pdfx",     # $ anchor -> allowed
            "https://h.example.com/tmp/anything", # /tmp/* -> blocked
            "https://h.example.com/tmpx",         # literal /tmp/ prefix required
        ],
    )
    assert got["https://h.example.com/a/b.pdf"][0] is False
    assert got["https://h.example.com/a/b.pdfx"][0] is True
    assert got["https://h.example.com/tmp/anything"][0] is False
    assert got["https://h.example.com/tmpx"][0] is True


def test_regex_specials_in_pattern_are_literal(spark):
    txt = "User-agent: *\nDisallow: /a+b(c)\n"
    got = _gate(
        spark,
        txt,
        ["https://h.example.com/a+b(c)/x", "https://h.example.com/aab"],
    )
    assert got["https://h.example.com/a+b(c)/x"][0] is False
    assert got["https://h.example.com/aab"][0] is True


def test_empty_disallow_comments_and_no_robots_host(spark):
    txt = "# policy\nUser-agent: *\nDisallow:\nDisallow: /x # inline\n"
    got = _gate(
        spark,
        txt,
        ["https://h.example.com/anything", "https://h.example.com/x/1"],
    )
    assert got["https://h.example.com/anything"] == (True, None)
    assert got["https://h.example.com/x/1"][0] is False
    # host with no robots.txt at all -> allowed
    rules = parse_robots(_robots(spark, [("h.example.com", txt)]))
    other = robots_gate(_pages(spark, ["https://nohost.example.com/x"]), rules)
    assert other.collect()[0]["allowed"] is True


def test_rules_before_any_group_are_ignored(spark):
    txt = "Disallow: /\nUser-agent: *\nDisallow: /x\n"
    rules = parse_robots(_robots(spark, [("h", txt)]))
    assert [r["value"] for r in rules.collect()] == ["/x"]


def test_crawl_delay_specific_over_star(spark):
    txt = (
        "User-agent: *\nCrawl-delay: 10\nDisallow: /x\n\n"
        "User-agent: webxbot\nCrawl-delay: 2\n"
    )
    rules = parse_robots(_robots(spark, [("h", txt)]))
    assert crawl_delays(rules, agent="webxbot").collect()[0]["delay_s"] == 2.0
    assert crawl_delays(rules, agent="unknown").collect()[0]["delay_s"] == 10.0


def test_sitemap_directive_host_wide(spark):
    txt = "Sitemap: https://h/s.xml\nUser-agent: *\nDisallow: /x\n"
    rows = sitemap_urls(_robots(spark, [("h", txt)])).collect()
    assert [(r["host"], r["sitemap_url"]) for r in rows] == [
        ("h", "https://h/s.xml")
    ]


def test_schedule_frontier_slots_and_delays(spark):
    from webx.robots import schedule_frontier

    frontier = _pages(
        spark,
        [
            "https://a.com/1", "https://a.com/2", "https://a.com/3",
            "https://b.com/1", "https://b.com/2",
        ],
    )
    delays = spark.createDataFrame([("a.com", 2.0)], "host string, delay_s double")
    out = {
        r["url"]: (r["fetch_slot"], r["fetch_at"])
        for r in schedule_frontier(frontier, delays, start_epoch=100).collect()
    }
    # a.com: 2s spacing; b.com: default 1s spacing; slots ordered by url
    assert out["https://a.com/1"] == (0, 100.0)
    assert out["https://a.com/2"] == (1, 102.0)
    assert out["https://a.com/3"] == (2, 104.0)
    assert out["https://b.com/1"] == (0, 100.0)
    assert out["https://b.com/2"] == (1, 101.0)
