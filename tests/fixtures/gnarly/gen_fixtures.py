#!/usr/bin/env python3
"""Generator for the gnarly fixture corpus (run once, goldens REVIEWED).

Each page is a hand-written messy-public-web specimen; the golden .txt is
produced by the extractor and then human-reviewed for "is this the main
content a careful reader would keep?" before committing — the reference's
paste-real-data system-test discipline (tests/st/test_train_eval_dummy.py:
22-100) applied to HTML. Re-running this script regenerates goldens; diffs
against committed goldens are extraction-behavior changes and must be
re-reviewed, never rubber-stamped.

Pages whose bytes aren't valid UTF-8 (charset specimens) are written from
the PAGES dict as explicit byte strings.
"""

from __future__ import annotations

import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(HERE, "..", "..", ".."))

PAGES: dict[str, bytes] = {}


def page(name: str, html):
    PAGES[name] = html.encode("utf-8") if isinstance(html, str) else html


page("01_entity_soup", """<!DOCTYPE html><html><head><meta charset="utf-8"><title>Entities</title></head><body>
<nav><a href="/">Home</a><a href="/glossary">Glossary</a></nav>
<article><h1>Typography &amp; entities in the wild</h1>
<p>Common pairs: &ldquo;curly quotes&rdquo;, the em&#8212;dash, caf&eacute;, na&iuml;ve, &frac12; cup, 3&times;4&nbsp;grid, &pound;5 &euro;7, and an unknown &fakeentity; stays literal.</p>
<p>Numeric forms: &#65;&#66;&#67; then hex &#x44;&#x45;&#x46; and a bare ampersand & here.</p>
</article>
<footer><p>&copy; site</p></footer></body></html>""")

page("02_unclosed_p_soup", """<html><head><title>Soup</title><body>
<div id=nav><a href=/>home</a> <a href=/b>blog</a></div>
<article>
<h1>Four paragraphs, zero closing tags
<p>The first paragraph simply never closes, like most of the 2003-era web.
<p>The second paragraph follows it immediately and also never closes.
<p>A third one, to make sure runs of open paragraphs merge in order.
<p>And the fourth wraps up the argument without a single closing tag.
</article></body></html>""")

page("03_table_data", """<!DOCTYPE html><html><head><meta charset="utf-8"><title>Trains</title></head><body>
<table class="nav"><tr><td><a href="/">Home</a></td><td><a href="/tickets">Tickets</a></td><td><a href="/help">Help</a></td></tr></table>
<article><h1>Morning departures from Centraal</h1>
<p>All trains below run daily except on public holidays, when a reduced schedule applies.</p>
<table border=1><tr><th>Time</th><th>Destination</th><th>Platform</th></tr>
<tr><td>07:12</td><td>Brussels South</td><td>4b</td></tr>
<tr><td>07:48</td><td>Paris North</td><td>6c</td></tr>
<tr><td>08:15</td><td>Berlin Main</td><td>2a</td></tr></table>
</article><footer><a href="/imprint">Imprint</a></footer></body></html>""")

page("04_pre_code", """<!DOCTYPE html><html><head><meta charset="utf-8"><title>Snippet</title></head><body>
<nav><a href="/docs">Docs</a><a href="/api">API</a></nav>
<article><h1>Comparing values safely</h1>
<p>The comparison below keeps spacing exactly as written, including the operators.</p>
<pre>
if (i &lt; j &amp;&amp; j &gt; 0) {
    total = total + rows[i];
}
</pre>
<p>Note that the escaped operators decode back to plain comparison signs.</p>
</article></body></html>""")

page("05_dl_glossary", """<html><head><meta charset=utf-8><title>Glossary</title></head><body>
<header><nav><a href="/">Index</a><a href="/a-z">A-Z</a></nav></header>
<article><h1>Crawl glossary</h1>
<dl>
<dt>Fetch</dt><dd>One HTTP request for one URL, successful or not, counted once.</dd>
<dt>Revisit</dt><dd>A fetch whose payload digest matched a previous capture of the same URL.</dd>
<dt>Frontier</dt><dd>The prioritized queue of URLs scheduled to be fetched next.</dd>
</dl></article>
<footer><p><a href="/terms">Terms</a></p></footer></body></html>""")

page("06_blockquote_cite", """<!DOCTYPE html><html><head><meta charset="utf-8"><title>Quote</title></head><body>
<nav><a href="/essays">Essays</a><a href="/about">About</a></nav>
<article><h1>On measurement</h1>
<p>A line often repeated in engineering retrospectives deserves its full context.</p>
<blockquote><p>Not everything that can be counted counts, and not everything that counts can be counted.</p></blockquote>
<p>Whatever its true origin, the warning about proxy metrics stands on its own.</p>
</article></body></html>""")

page("07_rtl_arabic", """<!DOCTYPE html><html dir="rtl" lang="ar"><head><meta charset="utf-8"><title>مقال</title></head><body>
<nav><a href="/">الرئيسية</a><a href="/news">الأخبار</a></nav>
<article><h1>عنوان المقال الرئيسي هنا</h1>
<p>هذه الفقرة الأولى من المقال وتحتوي على نص عربي كامل من اليمين إلى اليسار مع علامات الترقيم العادية.</p>
<p>الفقرة الثانية تؤكد أن الاستخراج يحافظ على ترتيب القراءة كما هو في المستند الأصلي.</p>
</article><footer><p>جميع الحقوق محفوظة</p></footer></body></html>""")

page("08_cjk_nospace", """<!DOCTYPE html><html lang="zh"><head><meta charset="utf-8"><title>文章</title></head><body>
<nav><a href="/">首页</a><a href="/news">新闻</a><a href="/about">关于</a></nav>
<article><h1>分布式数据处理入门指南</h1>
<p>中文文本没有空格分词，抽取器必须按字节处理整个段落而不会在任意位置截断内容，这一段用来验证该行为。</p>
<p>第二段继续说明：列式存储与谓词下推是大规模数据扫描的基础，合理的分区策略决定了作业的扩展性。</p>
</article><footer><p>版权所有</p></footer></body></html>""")

# windows-1252 bytes: smart quotes \x93\x94, apostrophe \x92, dash \x97
page(
    "09_win1252",
    b'<!DOCTYPE html><html><head><meta charset="windows-1252"><title>Quotes</title></head><body>'
    b'<nav><a href="/">Home</a></nav>'
    b"<article><h1>Editors\x92 picks this week</h1>"
    b"<p>\x93Smart quotes\x94 and the long dash \x97 survive because the declared "
    b"code page wins, exactly as the policy says.</p>"
    b"</article></body></html>",
)

page("10_latin1_decl_ascii", """<!DOCTYPE html><html><head><meta http-equiv="Content-Type" content="text/html; charset=iso-8859-1"><title>Legacy</title></head><body>
<nav><a href="/">Start</a><a href="/hilfe">Hilfe</a></nav>
<article><h1>A legacy page with a legacy declaration</h1>
<p>The body is plain ASCII on purpose; the point is that the iso-8859-1 declaration routes the decode without changing a single byte.</p>
</article></body></html>""")

page("11_figure_caption", """<!DOCTYPE html><html><head><meta charset="utf-8"><title>Figures</title></head><body>
<header><div>Photo blog</div><nav><a href="/">Home</a><a href="/archive">Archive</a></nav></header>
<article><h1>Fog over the harbor</h1>
<p>Shot half an hour before sunrise, when the water and the sky share one color.</p>
<figure><img src="/harbor.jpg" alt=""><figcaption>The east pier, 05:40, handheld at 1/25s.</figcaption></figure>
<p>The crane in the background disappears completely two frames later.</p>
</article></body></html>""")

page("12_details_summary", """<!DOCTYPE html><html><head><meta charset="utf-8"><title>FAQ</title></head><body>
<nav><a href="/">Home</a><a href="/faq">FAQ</a></nav>
<article><h1>Shipping questions answered</h1>
<details><summary>How long does standard delivery take?</summary>
<p>Between two and five working days for domestic orders, depending on the destination region.</p></details>
<details><summary>Can I change the address after ordering?</summary>
<p>Yes, until the parcel is handed to the carrier; after that the carrier's redirect service applies.</p></details>
</article></body></html>""")

page("13_nested_divitis", """<!DOCTYPE html><html><head><meta charset="utf-8"><title>Divs</title></head><body>
<div><div><div class="l1"><div class="l2"><div class="l3"><div class="l4"><div class="l5">
<header><nav><a href="/">Home</a><a href="/x">X</a></nav></header>
<div><div><article><div><div class="inner"><h1>Ten layers down, still readable</h1>
<div><p>Page builders wrap every element in a handful of divs; block structure survives because each div is just another boundary.</p></div>
</div></div></article></div></div>
</div></div></div></div></div></div></div></body></html>""")

page("14_sibling_articles", """<!DOCTYPE html><html><head><meta charset="utf-8"><title>Digest</title></head><body>
<nav><a href="/">Home</a><a href="/digest">Digest</a></nav>
<article><h1>First: the morning report</h1>
<p>Markets opened flat while the committee minutes were parsed line by line for intent.</p></article>
<div class="ad"><a href="/buy">Sponsored: buy now</a> <a href="/deal">Today's deal</a></div>
<article><h1>Second: the afternoon follow-up</h1>
<p>By close, the early reading had reversed twice, which the evening wrap politely called volatility.</p></article>
<footer><p><a href="/subscribe">Subscribe</a></p></footer></body></html>""")

page("15_comment_dashes", """<!DOCTYPE html><html><head><meta charset="utf-8"><title>Comments</title></head><body>
<!-- header start -- or is it -->
<nav><a href="/">Home</a><a href="/log">Log</a></nav>
<!--
  multi-line comment with <p>markup inside</p>
  and even an <article> that must never surface
-->
<article><h1>Comments with dashes inside</h1>
<p>The page is littered with comments containing double dashes and markup; none of it belongs to the content.</p>
</article><!-- trailing note --></body></html>""")

page("16_textarea_form", """<!DOCTYPE html><html><head><meta charset="utf-8"><title>Editor</title></head><body>
<nav><a href="/">Home</a><a href="/editor">Editor</a></nav>
<article><h1>Paste your snippet below</h1>
<p>The editor form keeps raw markup verbatim inside the textarea, and none of it is page content.</p>
</article>
<form action="/save" method="post">
<label>Snippet</label>
<textarea name="body"><p>This looks like a paragraph</p><h1>and a heading</h1> but it is form STATE, not content</textarea>
<button type="submit">Save draft</button>
</form>
<footer><p><a href="/help">Help</a></p></footer></body></html>""")

page("17_svg_between", """<!DOCTYPE html><html><head><meta charset="utf-8"><title>Chart</title></head><body>
<nav><a href="/">Home</a><a href="/metrics">Metrics</a></nav>
<article><h1>Throughput by week</h1>
<p>The run rate doubled after the partitioning change landed in week nineteen.</p>
<svg width="200" height="50"><text x="5" y="20">wk19</text><rect width="80" height="10"/></svg>
<p>The same chart over bytes instead of rows shows an even steeper slope.</p>
</article></body></html>""")

page("18_oldweb_center", """<html><head><title>Homepage</title></head><body bgcolor="#ffffff">
<center><font size=5>Welcome!</font></center>
<table width=100%><tr><td><a href="/guest">Guestbook</a> <a href="/links">Links</a> <a href="/webring">Webring</a>
<tr><td><article><h1>News from my corner of the web</h1>
<p>Updated the photo gallery and fixed the broken counter script that a visitor kindly reported by email.</p>
</article>
<tr><td align=center><a href="/legal"><font size=1>est. 1998 - best viewed at 800x600</font></a>
</table></body></html>""")

page("19_noscript_tracking", """<!DOCTYPE html><html><head><meta charset="utf-8"><title>Privacy note</title>
<script>window.dataLayer=window.dataLayer||[];function gtag(){dataLayer.push(arguments)}</script>
</head><body>
<noscript><img src="/collect?noscript=1" alt="">Tracking pixel placeholder text.</noscript>
<nav><a href="/">Home</a><a href="/privacy">Privacy</a></nav>
<article><h1>What the pixel does not see</h1>
<p>With scripts disabled the fallback pixel fires once, and the page content remains exactly this paragraph.</p>
</article></body></html>""")

page("20_malformed_attr_footer", """<!DOCTYPE html><html><head><meta charset="utf-8"><title>Broken footer</title></head><body>
<nav><a href="/">Home</a><a href="/status">Status</a></nav>
<article><h1>The content is fine, the footer is not</h1>
<p>Somewhere below this paragraph an unclosed attribute quote swallows markup until the next quote, and it must not take the article with it.</p>
</article>
<footer><div class="colophon><p>generated by legacy-cms 0.9</p></div><p>contact: webmaster</p></footer>
</body></html>""")

page("21_base_meta_refresh", """<!DOCTYPE html><html><head><meta charset="utf-8"><base href="https://cdn.example.org/mirror/"><meta http-equiv="refresh" content="600"><title>Mirrored</title></head><body>
<nav><a href="relative/one">One</a><a href="relative/two">Two</a></nav>
<article><h1>Served from a mirror</h1>
<p>The base element rewrites every relative link, and the refresh header reloads the page every ten minutes; neither changes the text.</p>
</article></body></html>""")

page("22_crossed_nesting", """<!DOCTYPE html><html><head><meta charset="utf-8"><title>Crossed</title></head><body>
<nav><a href="/">Home</a><a href="/b">B</a></nav>
<article><h1>Inline and block tags, crossed</h1>
<b><p>This paragraph opens inside a bold span that closes</b> midway through, and the paragraph keeps going regardless.</p>
<p>A normal closing paragraph follows to prove the lexer recovered.</i></p>
</article></body></html>""")

page("23_iframe_ins_del", """<!DOCTYPE html><html><head><meta charset="utf-8"><title>Edits</title></head><body>
<nav><a href="/">Home</a><a href="/changelog">Changelog</a></nav>
<iframe src="https://ads.example.net/slot/728x90" title="ad"></iframe>
<article><h1>Corrections to yesterday's post</h1>
<p>The figure was <del>fourteen</del> <ins>forty</ins> million rows, an order-of-magnitude slip a reader caught within minutes.</p>
</article>
<iframe src="https://ads.example.net/slot/300x250"></iframe>
</body></html>""")

page("24_kitchen_sink", """﻿<!DOCTYPE html><!--[if lt IE 9]><script src="/shim.js"></script><![endif]--><html><head>
<meta charset="utf-8"><meta property="og:desc" content="a > b & c < d">
<script type="application/ld+json">{"headline":"<h1>ghost</h1>"}</script>
<style>article:before{content:"not > text"}</style><title>Sink</title></head>
<body><body class=dup>
<nav><![if !IE]><span>legacy banner</span><![endif]><a href="/">Home</a><a href="/all">All</a></nav>
<table><tr><td><article><h1>Everything, everywhere, all at once</h1>
<![CDATA[ <p>cdata ghost</p> ]]>
<p data-x='{"k":"<i>v</i>"}'>One surviving paragraph carries the whole page, wrapped in <b>bold that never closes and a table that never ends.</p>
</article>
<footer><p><a href="/fin">fin</a></p></footer></body></html>
<div>rendered in 3ms</div>""")


page("25_frameset_noframes", """<!DOCTYPE HTML PUBLIC "-//W3C//DTD HTML 4.01 Frameset//EN"><html><head>
<title>Portal</title></head>
<frameset cols="20%,80%">
<frame src="menu.html" name="menu"><frame src="main.html" name="main">
<noframes><body>
<p>Your browser does not support frames. The station timetable moved to the
main page; the winter schedule starts on the first Sunday of December and
adds two late services on weekdays.</p>
<a href="main.html">Continue to the main page</a>
</body></noframes>
</frameset></html>""")

page("26_mso_email", """<html xmlns:v="urn:schemas-microsoft-com:vml" xmlns:o="urn:schemas-microsoft-com:office:office"><head>
<meta http-equiv=Content-Type content="text/html; charset=windows-1252">
<!--[if gte mso 9]><xml><o:OfficeDocumentSettings><o:PixelsPerInch>96</o:PixelsPerInch></o:OfficeDocumentSettings></xml><![endif]-->
<style><!-- p.MsoNormal {margin:0cm; font-size:11.0pt} --></style></head>
<body lang=EN-GB style='word-wrap:break-word'>
<div class=WordSection1>
<p class=MsoNormal>Hi team,<o:p></o:p></p>
<p class=MsoNormal>The quarterly crawl report is attached – headline numbers
below. Coverage grew nine percent and the dedup ratio held steady.<o:p></o:p></p>
<!--[if mso]><v:rect style='width:120pt;height:30pt'><v:textbox><center>ghost button</center></v:textbox></v:rect><![endif]-->
<p class=MsoNormal>Regards,<br>Ana<o:p></o:p></p>
</div></body></html>""".encode("windows-1252"))

page("27_minified_oneline", b"""<!DOCTYPE html><html><head><meta charset="utf-8"><title>Min</title><script>window.g={a:1,b:"</div>"}</script></head><body><nav><a href="/">x</a><a href="/y">y</a></nav><article><h1>Minified but meaningful</h1><p>Build pipelines strip every newline, so the whole document arrives as one line; the extractor must segment blocks from tags alone.</p><p>A stray NUL\x00 byte and a vertical\x0btab hide in this sentence.</p></article><footer><a href="/f">f</a></footer></body></html>""")


page("28_cdata_xhtml", """<?xml version="1.0" encoding="UTF-8"?>
<!DOCTYPE html PUBLIC "-//W3C//DTD XHTML 1.0 Strict//EN" "http://www.w3.org/TR/xhtml1/DTD/xhtml1-strict.dtd">
<html xmlns="http://www.w3.org/1999/xhtml"><head><title>CDATA</title>
<script type="text/javascript">//<![CDATA[
var cfg = {sel: "</p>", arrow: "->"};
//]]></script></head><body>
<div id="menu"><a href="/">Start</a> <a href="/archiv">Archiv</a></div>
<div class="post"><h1>XHTML survivors</h1>
<p>Strict-era pages shipped scripts inside CDATA blocks so validators would not choke on angle brackets.</p>
<p>The payload text sits in ordinary paragraphs and must come through untouched.</p>
</div><div id="footer"><a href="/impressum">Impressum</a></div></body></html>""")

page("29_unterminated_comment", """<!DOCTYPE html><html><head><meta charset="utf-8"><title>Chopped</title></head><body>
<nav><a href="/">home</a><a href="/tags">tags</a></nav>
<article><h1>The visible part of the page</h1>
<p>Everything up to the broken comment renders normally in every browser.</p>
<p>This is the last paragraph a reader actually sees.</p>
<!-- the editor pasted a comment and never closed it
<p>Ghost paragraph swallowed by the open comment in spec-compliant parsers.</p>
</article><footer><a href="/rss">rss</a></footer></body></html>""")

page("30_xmp_plaintext", """<html><head><title>Legacy raw text</title></head><body>
<div><a href="/">index</a> <a href="/old">old</a></div>
<h1>Markup examples from 1996</h1>
<p>The xmp element shows tags literally without entity encoding:</p>
<xmp>Use <b>bold</b> &amp; <i>italic</i> like this.</xmp>
<p>Text after the example keeps flowing as normal prose for the reader.</p>
</body></html>""")

page("31_cookie_overlay", """<!DOCTYPE html><html><head><meta charset="utf-8"><title>Consent</title></head><body>
<div class="cookie-banner"><p>We value your privacy</p><a href="#accept">Accept all</a> <a href="#reject">Reject</a> <a href="/privacy">Cookie policy</a> <a href="/partners">847 partners</a></div>
<header class="sticky"><a href="/">News</a><a href="/sport">Sport</a><a href="/weather">Weather</a><a href="/tv">TV</a></header>
<main><article><h1>Reservoir levels recover after wet spring</h1>
<p>Water authorities report storage at ninety-one percent of capacity, the highest
reading for May in a decade and well above the drought threshold.</p>
<p>Officials cautioned that a single wet season does not end the structural deficit,
pointing to falling groundwater tables across the southern basins.</p>
</article></main>
<div class="newsletter"><p>Get our headlines in your inbox</p><a href="/signup">Sign up</a></div>
<footer><a href="/about">About</a><a href="/contact">Contact</a></footer></body></html>""")

page("32_bare_lt_math", """<!DOCTYPE html><html><head><meta charset="utf-8"><title>Inequalities</title></head><body>
<nav><a href="/">home</a><a href="/math">math</a></nav>
<article><h1>Common inequality notation</h1>
<p>For positive reals we always have a<b whenever the ratio a/b stays below one, and clearly 1<2 holds.</p>
<p>Writers who skip &amp;lt; leave a bare less-than sign that parsers must treat as text, not as a tag opener.</p>
</article><footer><a href="/f">f</a></footer></body></html>""")


page("34_country_select", """<!DOCTYPE html><html><head><meta charset="utf-8"><title>Shipping</title></head><body>
<nav><a href="/">Shop</a><a href="/cart">Cart</a></nav>
<article><h1>International shipping rates</h1>
<p>Orders ship from the Rotterdam warehouse within two business days; customs
forms are prepared automatically for destinations outside the union.</p>
<p>Pick a destination
<select name="country"><option value="">Choose...</option><option>Netherlands<option>Belgium<option>Germany<option selected>France</select>
or start typing into the search box
<input list="ports"><datalist id="ports"><option value="Rotterdam"><option value="Antwerp">Antwerp harbour</datalist>
and the duty estimate updates in place.</p>
<p>Flat-rate boxes cost the same to every zone, which beats the per-kilo
tariff once a parcel passes four kilograms.</p>
<button class="cta">Calculate my rate</button>
</article><footer><a href="/terms">Terms</a></footer></body></html>""")

page("35_ruby_annotations", """<!DOCTYPE html><html><head><meta charset="utf-8"><title>読み方</title></head><body>
<nav><a href="/">ホーム</a><a href="/kanji">漢字</a></nav>
<article><h1>駅名の読み方</h1>
<p>終点の<ruby>御茶ノ水<rp>（</rp><rt>おちゃのみず</rt><rp>）</rp></ruby>駅で各駅停車に乗り換えると、
<ruby>秋葉原<rt>あきはばら</ruby>駅まで一駅で着きます。</p>
<p>案内放送は日本語と英語の順に流れ、ホームの電光掲示板にも両方の表記が出ます。</p>
</article><footer><a href="/about">運営情報</a></footer></body></html>""")

page("36_inline_svg_chart", """<!DOCTYPE html><html><head><meta charset="utf-8"><title>Latency report</title></head><body>
<nav><a href="/">Status</a><a href="/history">History</a></nav>
<article><h1>March latency report</h1>
<p>Median latency fell to eleven milliseconds
<svg width="120" height="24" role="img"><title>sparkline of weekly medians</title><desc>values 14 13 12 11</desc><polyline points="0,20 40,16 80,12 120,8"/><text x="2" y="10">p50</text></svg>
after the cache layer landed, a third below the February figure.</p>
<p>Tail latency tells the same story: the chart's right edge
<svg viewBox="0 0 80 20"><rect width="60" height="8"/><text x="4" y="16">p99 41ms</text></svg>
sits well under the old alert threshold.</p>
<p>The formula the dashboard uses is
<math><mi>p</mi><mo>=</mo><mfrac><mi>t</mi><mn>1000</mn></mfrac></math>
with samples bucketed per minute.</p>
</article><footer><a href="/rss">RSS</a></footer></body></html>""")

page("37_video_fallback", """<!DOCTYPE html><html><head><meta charset="utf-8"><title>Launch recap</title></head><body>
<nav><a href="/">Space blog</a><a href="/launches">Launches</a></nav>
<article><h1>Night launch recap</h1>
<p>The booster cleared the tower at 03:14 local time and the downrange
camera caught the stage separation against a clear sky.</p>
<video controls poster="/launch.jpg"><source src="/launch.mp4" type="video/mp4"><source src="/launch.webm" type="video/webm">
Your browser does not support embedded video; download the clip below.</video>
<p>Recovery crews reported the drone ship landing twelve minutes later,
the eighth flight for this particular booster.</p>
<audio controls src="/commentary.mp3">Audio commentary requires a newer browser.</audio>
<p>A full telemetry breakdown follows once the flight data is public.</p>
</article><footer><a href="/archive">Archive</a></footer></body></html>""")

page("38_spa_template_shell", """<!DOCTYPE html><html><head><meta charset="utf-8"><title>Orders</title></head><body>
<nav><a href="/">Console</a><a href="/orders">Orders</a></nav>
<article><h1>Order history</h1>
<p>Completed orders appear below within a minute of payment capture;
refunds show as negative rows in the same table.</p>
<template id="row-tpl"><div class="row"><span>{{id}}</span><span>{{total}}</span><button>Reorder</button></div></template>
<template id="empty-tpl"><div><p>No orders yet. Browse the catalog to get started.</p></div></template>
<p>Export is available as CSV for any date range up to one year.</p>
<iframe src="https://pay.example.com/widget" title="payment widget"><p>The payment widget needs frames; open the standalone page instead.</p></iframe>
</article><footer><a href="/support">Support</a></footer></body></html>""")


page("39_invisible_typography", """<!DOCTYPE html><html><head><meta charset="utf-8"><title>Silbentrennung</title></head><body>
<nav><a href="/">Zeitung</a><a href="/feuilleton">Feuilleton</a></nav>
<article><h1>Rechtschreib\u00adreform und Silben\u00adtrennung</h1>
<p>Die Donau\u00addampf\u00adschiff\u00adfahrts\u00adgesellschaft bleibt das
Schul\u00adbuch\u00adbeispiel f\u00fcr zusammen\u00adgesetzte Haupt\u00adw\u00f6rter,
deren weiche Trenn\u00adstellen ein Satz\u00adprogramm nur beim Umbruch sichtbar macht.</p>
<p>Redaktionen streuen auch Null\u200bbreiten\u200bzeichen in lange URLs wie
example.com/\u200bsehr/\u200blanger/\u200bpfad, damit Browser sie umbrechen;
ein Leser sieht davon nichts und ein Korpus darf es auch nicht.</p>
<p>Im Interview sagte die Setzerin: \u201eDer bedingte Trenn\u00adstrich ist
f\u00fcr die Darstellung da, nicht f\u00fcr den Text selbst\u201c \u2014 ein Satz, der
w\u00f6rtlich \u2066zitiert\u2069 und per \u202aLRE-Steuerzeichen\u202c markiert war.</p>
</article><footer><a href="/impressum">Impressum</a></footer></body></html>""")


# 40: charset declared LATE (past the WHATWG 1024-byte prescan window)
# — a huge comment pushes <meta charset=windows-1252> beyond byte 1024;
# spec prescan only examines the first 1024 bytes, so the declaration
# is ignored and the strict-utf-8 attempt fails on the 0x93/0x94 bytes,
# landing on the TOTAL latin-1 fallback (webx/charset.py:18-19,
# status=charset_fallback — garbled-but-flagged, never dropped): the
# curly quotes surface as U+0093/U+0094 C1 controls while every ASCII
# byte survives untouched. Deterministic, documented behavior.
PAGES["40_late_charset_decl"] = (
    b"<!DOCTYPE html><html><head>"
    b"<!-- " + b"x" * 1100 + b" -->"
    b'<meta charset="windows-1252"><title>Late</title></head><body>'
    b"<nav><a href=\"/\">Home</a></nav>"
    b"<article><h1>Declared too late to matter</h1>"
    b"<p>The prescan window closes at 1024 bytes, so this page falls back "
    b"to the flagged total-fallback decode and the \x93smart quotes\x94 in "
    b"this sentence arrive garbled but counted, never silently dropped.</p>"
    b"</article></body></html>"
)

page("41_meta_refresh_stub", """<!DOCTYPE html><html><head><meta charset="utf-8"><title>Moved</title>
<meta http-equiv="refresh" content="0;url=https://example.com/new-home"></head><body>
<p>This page has moved. If you are not redirected automatically, follow
<a href="https://example.com/new-home">this link to the new location</a>
and update any bookmarks you may have saved for the old address.</p>
</body></html>""")

page("42_table_layout_newsletter", """<html><head><title>Weekly digest</title></head><body bgcolor="#ffffff">
<table width="600" align="center" cellpadding="0" cellspacing="0"><tr><td>
<table width="100%"><tr><td bgcolor="#003366"><font color="#ffffff" size="4">ACME WEEKLY</font></td>
<td align="right"><a href="https://example.com/view-online">View online</a></td></tr></table>
<table width="100%"><tr><td>
<font size="3"><b>Shipping resumes on all northern routes</b></font><br>
The icebreaker fleet cleared the final channel on Tuesday and the port
authority confirmed that scheduled departures restart this weekend,
with backlogged cargo given priority in the first week.<br><br>
<font size="3"><b>Fuel surcharge unchanged for March</b></font><br>
Despite spot price swings the board voted to hold the surcharge at
four percent, citing hedged contracts that run through the quarter.
</td></tr></table>
<table width="100%"><tr><td align="center"><font size="1">
You receive this because you subscribed at example.com.
<a href="https://example.com/unsub">Unsubscribe</a> ·
<a href="https://example.com/prefs">Preferences</a></font></td></tr></table>
</td></tr></table></body></html>""")

page("43_forum_thread", """<!DOCTYPE html><html><head><meta charset="utf-8"><title>Thread: torque specs</title></head><body>
<nav class="breadcrumbs"><a href="/">Forum</a> &gt; <a href="/f/12">Engines</a> &gt; Thread</nav>
<div class="thread"><div class="post"><div class="post-meta"><a href="/u/alice">alice</a> · 2019-03-04</div>
<div class="post-body"><p>Does anyone have the head bolt torque sequence for the 2.4 litre
variant? The manual I have only covers the 2.0 and the numbers do not
transfer across because the head casting is different.</p></div></div>
<div class="post"><div class="post-meta"><a href="/u/bob">bob</a> · 2019-03-04</div>
<div class="post-body"><blockquote><p>The manual I have only covers the 2.0</p></blockquote>
<p>The 2.4 uses a three-stage sequence: thirty newton metres, then sixty,
then a ninety degree turn, working from the centre outwards in a spiral.
Replace the bolts every time; they are torque-to-yield.</p></div></div>
<div class="post"><div class="post-meta"><a href="/u/alice">alice</a> · 2019-03-05</div>
<div class="post-body"><p>That matches what the machine shop told me this morning, thanks.
For anyone searching later: the spiral pattern is printed on a sticker
under the timing cover on late production blocks.</p></div></div></div>
<div class="signature">Opinions are my own · <a href="/rules">forum rules</a></div>
</body></html>""")

page("44_paywall_stub", """<!DOCTYPE html><html><head><meta charset="utf-8"><title>Exclusive report</title>
<script type="application/ld+json">{"@type":"NewsArticle","headline":"Regulator opens inquiry into grid operator","isAccessibleForFree":"False"}</script>
</head><body>
<header><a href="/">The Ledger</a><a href="/subscribe">Subscribe</a></header>
<article><h1>Regulator opens inquiry into grid operator</h1>
<p>The energy regulator confirmed on Monday that it has opened a formal
inquiry into last month's cascading outage, focusing on whether the
operator's maintenance deferrals breached its licence conditions.</p>
<div class="paywall"><p>Subscribe to continue reading. Already a member?
<a href="/login">Sign in</a> for full access to this article and our
complete archive of investigations.</p></div>
</article><footer><a href="/about">About</a></footer></body></html>""")


page("46_product_page", """<!DOCTYPE html><html><head><meta charset="utf-8"><title>Trail Lantern 400 – ACME Outdoor</title></head><body>
<nav class="breadcrumbs"><a href="/">Home</a> › <a href="/outdoor">Outdoor</a> › <a href="/outdoor/lighting">Lighting</a></nav>
<main><h1>Trail Lantern 400</h1>
<p>The Trail Lantern 400 is a rechargeable camp light with a warm-to-cool
dimming range and an IPX5 housing that shrugs off sideways rain. At its
lowest setting a single charge lasts four nights of reading.</p>
<table class="specs"><caption>Specifications</caption>
<tr><th>Weight</th><td>240 g</td></tr>
<tr><th>Output</th><td>400 lumens</td></tr>
<tr><th>Charge time</th><td>3.5 hours</td></tr></table>
<div class="related"><h3>Related products</h3><a href="/p/1">Trail Lantern 200</a> <a href="/p/2">Storm Cord</a> <a href="/p/3">Peg Kit</a></div>
<section class="reviews"><h2>Reviews</h2>
<div class="review"><p>Survived a week of coastal drizzle strapped to the
tent ridge line; the low amber mode is the feature nobody advertises and
everybody ends up using.</p></div>
<div class="review"><p>Heavier than the spec sheet suggests once you add
the hanging hook, but the charge indicator is honest and the strap stows
flat.</p></div></section></main>
<footer><a href="/returns">Returns</a> <a href="/contact">Contact</a></footer></body></html>""")

page("47_wiki_infobox", """<!DOCTYPE html><html><head><meta charset="utf-8"><title>Port Selden - Encyclopedia</title></head><body>
<div id="toc" class="toc"><ul><li><a href="#history">1 History</a></li><li><a href="#economy">2 Economy</a></li><li><a href="#climate">3 Climate</a></li></ul></div>
<h1>Port Selden</h1>
<table class="infobox"><caption>Port Selden</caption>
<tr><th>Country</th><td>Vestland</td></tr>
<tr><th>Population</th><td>83,214 (2024)</td></tr>
<tr><th>Elevation</th><td>12 m</td></tr></table>
<p>Port Selden is a harbour city on the northern coast of Vestland and the
administrative seat of the surrounding county. The sheltered deep-water
anchorage made it a naval staging point long before the railway arrived.</p>
<h2 id="history">History</h2>
<p>The settlement grew around a twelfth-century customs post; the oldest
surviving warehouse on the quay is dated by its roof timbers to 1371.</p>
<h2 id="economy">Economy</h2>
<p>Container transshipment and fish processing dominate, though the yards
that once built icebreakers now refit offshore wind installation vessels.</p>
<h2>References</h2>
<ol class="references"><li><a href="/ref1">Harbour board annual report</a></li>
<li><a href="/ref2">County statistical yearbook</a></li></ol>
</body></html>""")

page("48_docs_code", """<!DOCTYPE html><html><head><meta charset="utf-8"><title>quickstart - veldt 2.3 docs</title></head><body>
<nav class="sidebar"><a href="/docs">Docs</a><a href="/api">API</a><a href="/faq">FAQ</a></nav>
<article><h1>Quickstart</h1>
<p>Install the package, point it at a manifest, and the watcher rebuilds
whatever the manifest reaches. The defaults are deliberately boring.</p>
<pre><code>$ veldt init --manifest veldt.toml
$ veldt watch src/ --jobs 4</code></pre>
<p>Configuration lives in a single TOML table; unknown keys are rejected
at parse time rather than silently ignored.</p>
<pre><code>[build]
target = "release"
incremental = true   # reuse object cache &amp; skip unchanged units

[watch]
debounce_ms = 40     # coalesce editor save bursts</code></pre>
<p>Exit codes follow the usual convention: zero on success, two for a
manifest error, three when the watcher loses the directory.</p>
</article><footer><a href="/license">License</a></footer></body></html>""")

page("49_blog_comments", """<!DOCTYPE html><html><head><meta charset="utf-8"><title>Why our build got slower</title></head><body>
<header class="masthead"><a href="/">tinkerlog</a><a href="/archive">Archive</a></header>
<article><h1>Why our build got slower</h1>
<p>We spent a month blaming the linker when the real cost was a generated
header that invalidated sixty translation units every time the version
string changed. Moving the timestamp out of the header fixed nine tenths
of the regression.</p>
<p>The lesson generalizes: measure the dependency graph before touching
the toolchain, because the graph is usually lying about what is hot.</p>
</article>
<section class="comments"><h2>Comments</h2>
<div class="comment"><p>We hit the same thing with an embedded git hash;
writing it to a .o at link time instead of a header removed the fan-out
entirely.</p></div>
<div class="comment"><p>Worth noting ccache masks this until the cache
fills, which is why it only showed up on fresh CI runners.</p></div>
</section>
<footer><p>© tinkerlog</p></footer></body></html>""")

page("50_press_release", """<!DOCTYPE html><html><head><meta charset="utf-8"><title>ACME opens Vestland assembly plant</title></head><body>
<header><a href="/">ACME Newsroom</a><a href="/media">Media kit</a></header>
<article><h1>ACME opens Vestland assembly plant</h1>
<p>PORT SELDEN, 12 March — ACME Industrial today opened its first
assembly plant in Vestland, a 40,000 square metre facility that will
build drive units for the offshore wind fleet and employ about six
hundred people at full capacity.</p>
<p>The site was chosen for its quay access: nacelle housings leave the
hall on rail bogies and roll directly onto the installation vessels that
berth alongside, removing two crane lifts from every delivery.</p>
<p class="boilerplate">About ACME Industrial: ACME designs and builds
electric drive systems for marine and heavy industry, operating twelve
plants in eight countries.</p>
<p class="contact">Media contact: <a href="mailto:press@acme.example">press@acme.example</a>, +47 55 00 00 00.</p>
</article></body></html>""")


def main() -> None:
    import pandas as pd

    from webx.config import ExtractConfig
    from webx.extract import extract_batch

    cfg = ExtractConfig()
    for name, html in sorted(PAGES.items()):
        with open(os.path.join(HERE, f"{name}.html"), "wb") as fh:
            fh.write(html)
        out = extract_batch(pd.DataFrame({"url": [name], "html": [html]}), cfg)
        text = out.iloc[0]["text"]
        with open(os.path.join(HERE, f"{name}.txt"), "w", encoding="utf-8") as fh:
            fh.write(text)
        print(f"===== {name} =====")
        print(text)
        print()


if __name__ == "__main__":
    main()
