"""Byte-exact goldens on realistic, NON-template page layouts — the
behavior contract of the density heuristic beyond the synthetic fixtures:
chrome (nav/breadcrumb/related/footer) dropped; article body, captions,
bylines, code blocks and table cells kept in reading order."""

from __future__ import annotations

import pandas as pd

from webx.config import ExtractConfig
from webx.extract import extract_batch

CFG = ExtractConfig()


def run(html: bytes) -> str:
    out = extract_batch(pd.DataFrame({"url": ["u"], "html": [html]}), CFG)
    return out.iloc[0]["text"]


def test_blog_post_with_comments():
    html = b"""<!DOCTYPE html><html><head><title>My Blog - Why Spark Wins</title>
<style>body{margin:0}</style></head><body>
<header><div>My Blog</div><nav><ul><li><a href="/">Home</a></li><li><a href="/archive">Archive</a></li></ul></nav></header>
<main><article><h1>Why Spark Wins</h1>
<p>Distributed dataframes changed how teams process web-scale corpora in practice.</p>
<p>The optimizer handles pushdown and pruning, so engineers declare intent instead of scheduling work.</p>
<figure><img src="/x.png"><figcaption>Figure 1: a cluster diagram</figcaption></figure>
<p>In the end, throughput comes from keeping the plan narrow and the data columnar.</p>
</article>
<section class="comments"><h3>Comments</h3>
<div><p>Great post, thanks for sharing all these practical details!</p></div>
<div><p>I disagree with the second point about scheduling, but well written.</p></div>
</section></main>
<footer><p>(c) 2026 My Blog. <a href="/rss">RSS</a></p></footer></body></html>"""
    assert run(html) == (
        "Why Spark Wins\n"
        "Distributed dataframes changed how teams process web-scale corpora in practice.\n"
        "The optimizer handles pushdown and pruning, so engineers declare intent instead of scheduling work.\n"
        "Figure 1: a cluster diagram\n"
        "In the end, throughput comes from keeping the plan narrow and the data columnar.\n"
        "Comments\n"
        "Great post, thanks for sharing all these practical details!\n"
        "I disagree with the second point about scheduling, but well written."
    )
    # policy: comment sections are kept — they are real text with low link
    # density; filtering them is a downstream quality-model decision


def test_docs_page_with_code_and_table():
    html = b"""<html><head><title>API Reference</title></head><body>
<nav><a href="/docs">Docs</a> / <a href="/docs/api">API</a></nav>
<h1>extract()</h1>
<p>Runs the two stage extraction pipeline over a table of raw pages and returns spans.</p>
<pre>result = extract(pages)
print(result.count())</pre>
<p>The function accepts a configuration object controlling thresholds and truncation.</p>
<table><tr><th>arg</th><th>meaning</th></tr><tr><td>pages</td><td>input dataframe of url and html</td></tr></table>
</body></html>"""
    assert run(html) == (
        "extract()\n"
        "Runs the two stage extraction pipeline over a table of raw pages and returns spans.\n"
        "result = extract(pages)\n"
        "print(result.count())\n"
        "The function accepts a configuration object controlling thresholds and truncation.\n"
        "arg\nmeaning\npages\ninput dataframe of url and html"
    )


def test_news_article_breadcrumbs_and_related_dropped():
    html = b"""<html><body>
<div id="breadcrumb"><a href="/">Home</a> &gt; <a href="/world">World</a></div>
<h1>Storm Sweeps Across the Coast Overnight</h1>
<p class="byline">By A. Reporter, Staff Writer</p>
<p>Residents woke to downed power lines and flooded streets after the storm made landfall.</p>
<p>Officials said recovery crews would work through the weekend to restore service.</p>
<div class="related"><a href="/a">Related: Last year's storm</a> <a href="/b">Related: Preparedness guide</a></div>
</body></html>"""
    text = run(html)
    assert text == (
        "Storm Sweeps Across the Coast Overnight\n"
        "By A. Reporter, Staff Writer\n"
        "Residents woke to downed power lines and flooded streets after the storm made landfall.\n"
        "Officials said recovery crews would work through the weekend to restore service."
    )
    assert "Related" not in text and "Home" not in text
