"""Curation operators: decontamination, host caps, sequence packing."""

from __future__ import annotations

from pyspark.sql import functions as F

from webx.curate import cap_per_host, contaminated_ids, pack_sequences


def test_contaminated_ids_flags_overlap(spark):
    bench_text = " ".join(f"b{i}" for i in range(13))
    docs = spark.createDataFrame(
        [
            (1, "clean document with entirely different words here now"),
            (2, "prefix words then " + bench_text + " trailing tail"),
            (3, bench_text),  # exact benchmark copy
            (4, " ".join(f"b{i}" for i in range(12))),  # only 12-gram prefix: clean
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([(bench_text,)], "text string")
    got = sorted(r["doc_id"] for r in contaminated_ids(docs, bench, n=13).collect())
    assert got == [2, 3]


def test_contaminated_ids_case_insensitive(spark):
    t = " ".join(f"W{i}" for i in range(13))
    docs = spark.createDataFrame([(1, t.lower())], "doc_id long, text string")
    bench = spark.createDataFrame([(t,)], "text string")
    assert [r["doc_id"] for r in contaminated_ids(docs, bench).collect()] == [1]


def test_cap_per_host_keeps_lowest_ids(spark):
    rows = [(i, "h%d" % (i % 2)) for i in range(10)]
    d = spark.createDataFrame(rows, "doc_id long, host string")
    kept = sorted(r["doc_id"] for r in cap_per_host(d, max_per_host=3).collect())
    # per host (parity classes), the 3 smallest ids survive
    assert kept == [0, 1, 2, 3, 4, 5]


def test_pack_sequences_greedy_bins(spark):
    # token counts: 3, 3, 3 with max 7 -> bins [0,0,1]; oversized doc own bin
    rows = [
        ("en", 1, "a b c"),
        ("en", 2, "d e f"),
        ("en", 3, "g h i"),
        ("en", 4, " ".join(f"x{i}" for i in range(9))),  # 9 > 7: own bin
        ("en", 5, "tail words"),
        ("fr", 1, "un deux trois"),  # separate group restarts at bin 0
    ]
    d = spark.createDataFrame(rows, "lang string, doc_id long, text string")
    out = {
        (r["grp"], r["doc_id"]): (r["n_tokens"], r["bin"])
        for r in pack_sequences(d, max_tokens=7, group_col="lang").collect()
    }
    assert out[("en", 1)] == (3, 0)
    assert out[("en", 2)] == (3, 0)
    assert out[("en", 3)] == (3, 1)
    assert out[("en", 4)] == (9, 2)
    assert out[("en", 5)] == (2, 3)
    assert out[("fr", 1)] == (3, 0)


def test_pack_sequences_bins_respect_cap(spark):
    """Property: every bin's token sum <= max_tokens unless it is a
    single oversized document."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = pack_sequences(docs, max_tokens=256, group_col="lang")
    agg = (
        out.groupBy("grp", "bin")
        .agg(F.sum("n_tokens").alias("s"), F.count("*").alias("c"))
        .collect()
    )
    assert agg
    for r in agg:
        assert r["s"] <= 256 or r["c"] == 1, (r["grp"], r["bin"], r["s"], r["c"])


def test_paragraph_dedup_first_occurrence_wins(spark):
    from webx.curate import paragraph_dedup

    rows = [
        (1, "unique one\nSHARED FOOTER\nalso unique"),
        (2, "other text\nSHARED FOOTER"),
        (3, "SHARED FOOTER"),
        (4, "standalone"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in paragraph_dedup(d).collect()}
    assert out[1]["text"] == "unique one\nSHARED FOOTER\nalso unique"
    assert out[2]["text"] == "other text"
    assert out[3]["text"] == ""  # nothing survives
    assert out[3]["n_paragraphs"] == 1 and out[3]["n_kept"] == 0
    assert out[4]["text"] == "standalone"


def test_paragraph_dedup_keeps_short_paragraphs(spark):
    from webx.curate import paragraph_dedup

    rows = [(1, "a\n\nb"), (2, "c\n\nd")]  # empty paragraphs everywhere
    d = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["text"] for r in paragraph_dedup(d).collect()}
    # empty paragraphs are structure, not content: both docs keep theirs
    assert out == {1: "a\n\nb", 2: "c\n\nd"}


def test_contaminated_ids_hashed_matches_string_variant(spark):
    """The 64-bit-hash scale path must flag exactly the same doc_ids as
    the exact string path (differential, incl. the <n-token fallback)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    bench = docs.filter(F.col("doc_id") % 17 == 0).select("text")
    a = sorted(r["doc_id"] for r in __import__("webx.curate", fromlist=["contaminated_ids"]).contaminated_ids(docs, bench, n=13).collect())
    b = sorted(r["doc_id"] for r in __import__("webx.curate", fromlist=["contaminated_ids"]).contaminated_ids(docs, bench, n=13, hashed=True).collect())
    assert a == b and len(a) > 0
    # short-doc fallback path too
    short = spark.createDataFrame([(1, "only four words here"), (2, "different short text")], "doc_id long, text string")
    sb = spark.createDataFrame([("only four words here",)], "text string")
    for hv in (False, True):
        got = [r["doc_id"] for r in contaminated_ids(short, sb, n=13, hashed=hv).collect()]
        assert got == [1], hv


def test_importance_weights_dsir_ordering(spark):
    """DSIR sanity: documents resembling the target domain score higher
    log importance than off-domain ones; integer masses are exact."""
    from webx.curate import importance_weights

    target_like = "the cat sat on the mat with another cat and a kitten"
    off = "quarterly revenue figures exceeded analyst expectations this fiscal year"
    docs = spark.createDataFrame(
        [
            (1, target_like),
            (2, "a cat and a kitten sat near the mat"),
            (3, off),
            (4, "totally unrelated spreadsheet pivot table macros formulas"),
        ],
        "doc_id long, text string",
    )
    target = spark.createDataFrame(
        [(target_like,), ("cats and kittens on mats",)], "text string"
    )
    out = {r["doc_id"]: r for r in importance_weights(docs, target, buckets=512).collect()}
    assert out[1]["log_weight"] > out[3]["log_weight"]
    assert out[2]["log_weight"] > out[4]["log_weight"]
    # exact integer core: doc 1 IS a target doc, so every gram hits
    # target buckets -> t_mass covers all grams
    assert out[1]["t_mass"] >= out[1]["n_grams"]
    assert out[3]["t_mass"] <= 2  # at most accidental bucket collisions
    # n_grams = unigrams + bigrams = tokens + tokens-1
    ntok = len(target_like.split())
    assert out[1]["n_grams"] == 2 * ntok - 1


def test_resolve_href_cases(spark):
    from webx.urls import resolve_href

    rows = [
        ("https://a.com/dir/page.html?q=1", "https://b.com/x", "https://b.com/x"),
        ("https://a.com/dir/page.html", "//cdn.com/lib.js", "https://cdn.com/lib.js"),
        ("https://a.com/dir/page.html", "/root", "https://a.com/root"),
        ("https://a.com/dir/page.html", "sibling.html", "https://a.com/dir/sibling.html"),
        ("https://a.com/dir/page.html", "#sec", None),
        ("https://a.com/dir/page.html", "mailto:x@y.z", None),
        ("https://a.com/dir/page.html", "javascript:void(0)", None),
        ("http://a.com/", "/p?x=2", "http://a.com/p?x=2"),
    ]
    d = spark.createDataFrame([(b, h) for b, h, _ in rows], "base string, href string")
    got = [
        r["r"]
        for r in d.select(resolve_href(F.col("base"), F.col("href")).alias("r")).collect()
    ]
    assert got == [e for _, _, e in rows]


def test_base_href_resolution(spark):
    """<base href> overrides the page url for relative links: relative
    hrefs resolve against the base's directory, root-relative against
    the BASE's origin (cross-origin base pulls them off-host), absolute
    hrefs and fragments are base-immune; only the FIRST base counts and
    the match is case-insensitive. A fragment-only base is unusable and
    falls back to the page url."""
    from webx.urls import extract_anchors, extract_links

    pages = spark.createDataFrame(
        [
            # absolute cross-origin base, mixed-case tag, second base ignored
            ("https://a.com/sec/1/index.html",
             b'<head><BASE target="_b" HREF="https://cdn.org/assets/">'
             b'<base href="https://evil.org/"></head>'
             b'<a href="rel.html">r</a><a href="/root.html">o</a>'
             b'<a href="https://x.test/abs">a</a><a href="#top">f</a>'),
            # root-relative base: resolves against the page origin
            ("https://a.com/sec/2/index.html",
             b'<base href="/deep/dir/"><a href="rel.html">r</a>'),
            # document-relative base: resolves against the page directory
            ("https://a.com/sec/3/index.html",
             b'<base href="docs/"><a href="rel.html">r</a>'),
            # unusable (fragment) base: falls back to the page url
            ("https://a.com/sec/4/index.html",
             b'<base href="#x"><a href="rel.html">r</a>'),
            # no base at all
            ("https://a.com/sec/5/index.html", b'<a href="rel.html">r</a>'),
        ],
        "url string, html binary",
    )
    anchors = {
        (r["url"], r["href"]): r["resolved"]
        for r in extract_anchors(pages).collect()
    }
    assert anchors[("https://a.com/sec/1/index.html", "rel.html")] == \
        "https://cdn.org/assets/rel.html"
    assert anchors[("https://a.com/sec/1/index.html", "/root.html")] == \
        "https://cdn.org/root.html"  # base origin, not the page's
    assert anchors[("https://a.com/sec/1/index.html", "https://x.test/abs")] == \
        "https://x.test/abs"
    assert anchors[("https://a.com/sec/1/index.html", "#top")] is None
    assert anchors[("https://a.com/sec/2/index.html", "rel.html")] == \
        "https://a.com/deep/dir/rel.html"
    assert anchors[("https://a.com/sec/3/index.html", "rel.html")] == \
        "https://a.com/sec/3/docs/rel.html"
    assert anchors[("https://a.com/sec/4/index.html", "rel.html")] == \
        "https://a.com/sec/4/rel.html"
    assert anchors[("https://a.com/sec/5/index.html", "rel.html")] == \
        "https://a.com/sec/5/rel.html"
    # extract_links agrees (it also emits the base tags' own hrefs)
    links = {
        (r["url"], r["href"]): r["resolved"]
        for r in extract_links(pages).collect()
    }
    for k, v in anchors.items():
        assert links[k] == v
    assert links[("https://a.com/sec/1/index.html",
                  "https://cdn.org/assets/")] == "https://cdn.org/assets/"


def test_hreflang_alternates(spark):
    """One row per hreflang declaration: lang lowercased, target
    base-resolved; alternates without hreflang (feed links) and
    fragment targets dropped."""
    from webx.urls import hreflang_alternates

    pages = spark.createDataFrame(
        [
            ("https://a.com/p/1",
             b'<link rel="alternate" hreflang="en" href="https://a.com/en">'
             b"<link href='/fr' hreflang='fr' rel='alternate'>"
             b'<LINK REL="alternate" HREFLANG="DE" HREF="de.html">'
             b'<link rel="alternate" type="application/rss+xml" href="/feed">'
             b'<link rel="alternate" hreflang="es" href="#frag">'),
            ("https://a.com/p/2", b"<p>none</p>"),
        ],
        "url string, html binary",
    )
    got = {
        (r["hreflang"]): r["alt_url"]
        for r in hreflang_alternates(pages).collect()
    }
    assert got == {
        "en": "https://a.com/en",
        "fr": "https://a.com/fr",
        "de": "https://a.com/p/de.html",
    }


def test_image_srcset_best_and_media_sources(spark):
    """srcset: largest descriptor wins regardless of order,
    descriptorless counts as 1x, base resolution applies; media tags:
    one row per src-bearing video/audio/source with mime + poster."""
    from webx.urls import image_srcset_best, media_sources

    pages = spark.createDataFrame(
        [
            ("https://a.com/p",
             b'<img srcset="/a-320.jpg 320w, /a-800.jpg 800w" src="/a.jpg" alt="A">'
             b'<img srcset="/b.jpg, /b@2x.jpg 2x" alt="B">'
             b'<img src="/plain.jpg" alt="no srcset">'
             b'<picture><source srcset="/pic-1200.avif 1200w, /pic-600.avif 600w" '
             b'type="image/avif"><img src="/pic.jpg" alt="P"></picture>'
             b'<video src="/v.mp4" poster="/v.jpg"></video>'
             b"<video><source src='/v.webm' type='video/webm'></video>"
             b'<audio src="/a.mp3">'),
        ],
        "url string, html binary",
    )
    best = {r["best_src"]: r for r in image_srcset_best(pages).collect()}
    assert set(best) == {"https://a.com/a-800.jpg", "https://a.com/b@2x.jpg",
                         "https://a.com/pic-1200.avif"}
    assert best["https://a.com/pic-1200.avif"]["fallback_src"] is None
    assert best["https://a.com/a-800.jpg"]["fallback_src"] == "https://a.com/a.jpg"
    assert best["https://a.com/b@2x.jpg"]["fallback_src"] is None
    med = {(r["tag"], r["media_url"]): r for r in media_sources(pages).collect()}
    assert set(med) == {
        ("video", "https://a.com/v.mp4"),
        ("source", "https://a.com/v.webm"),
        ("audio", "https://a.com/a.mp3"),
    }
    assert med[("video", "https://a.com/v.mp4")]["poster_url"] == "https://a.com/v.jpg"
    assert med[("source", "https://a.com/v.webm")]["mime"] == "video/webm"


def test_image_captions(spark):
    """src base-resolved, alt whitespace-collapsed, declared dims as
    ints (NULL when absent); empty-alt and data:-URI images dropped;
    require_alt=False keeps captionless images with alt=''."""
    from webx.urls import image_captions

    pages = spark.createDataFrame(
        [
            ("https://a.com/p",
             b'<img src="/i/1.jpg" alt="A  dog" width="640" height="480">'
             b'<img width=320 SRC="rel.png" ALT="cat\n pic">'
             b'<img src="/i/2.jpg" alt="">'
             b'<img src="data:image/png;base64,AA" alt="inline">'
             b'<img src="/i/3.jpg">'
             b'<img data-src="/lazy.jpg" alt="lazy loaded" class="lazyload">'
             b'<img data-src="/hijack.jpg" src="/real.jpg" alt="src wins">'),
        ],
        "url string, html binary",
    )
    rows = {r["img_url"]: r for r in image_captions(pages).collect()}
    assert set(rows) == {"https://a.com/i/1.jpg", "https://a.com/rel.png",
                         "https://a.com/lazy.jpg", "https://a.com/real.jpg"}
    assert rows["https://a.com/lazy.jpg"]["alt"] == "lazy loaded"
    # a data-src must never hijack a present src
    assert rows["https://a.com/i/1.jpg"]["alt"] == "A dog"
    assert rows["https://a.com/i/1.jpg"]["width"] == 640
    assert rows["https://a.com/i/1.jpg"]["height"] == 480
    assert rows["https://a.com/rel.png"]["alt"] == "cat pic"
    assert rows["https://a.com/rel.png"]["width"] == 320
    assert rows["https://a.com/rel.png"]["height"] is None
    # without the alt gate, the captionless images come through
    all_rows = image_captions(pages, require_alt=False).collect()
    assert len(all_rows) == 6  # data: URI still dropped


def test_bitext_pairs_reciprocity(spark):
    """Only mutually-declared pairs survive: one-way declarations and
    x-default rows never pair; each pair is emitted once (url_a <
    url_b) with the lang the DECLARING side attributed."""
    from webx.urls import bitext_pairs

    alts = spark.createDataFrame(
        [
            ("https://a.com/en", "fr", "https://a.com/fr"),   # mutual
            ("https://a.com/fr", "en", "https://a.com/en"),
            ("https://a.com/en", "de", "https://a.com/de"),   # one-way
            ("https://a.com/en", "x-default", "https://a.com/en"),
            ("https://b.com/x", "es", "https://b.com/y"),     # one-way
        ],
        "url string, hreflang string, alt_url string",
    )
    lang = spark.createDataFrame(
        [("https://a.com/en", "en"), ("https://a.com/fr", "fr"),
         ("https://b.com/x", "en")],
        "url string, lang string",
    )
    got = [tuple(r) for r in bitext_pairs(alts, lang).collect()]
    assert got == [("https://a.com/en", "en", "https://a.com/fr", "fr")]


def test_rel_canonical_and_meta_refresh(spark):
    """Canonical link and meta-refresh targets resolve against the
    page's effective base; absent/unusable declarations yield ''. Attr
    order, case, separator form (';' vs ','), and inner quotes must not
    matter; a <base href> shifts a relative canonical."""
    from webx.urls import meta_refresh_target, rel_canonical

    pages = spark.createDataFrame(
        [
            ("https://a.com/p/1",
             b'<link rel="canonical" href="https://a.com/c/1">'),
            ("https://a.com/p/2", b"<link href='/c/2' rel='canonical'>"),
            ("https://a.com/p/3",
             b'<base href="https://cdn.org/x/"><link rel="canonical" href="c">'),
            ("https://a.com/p/4",
             b'<meta http-equiv="refresh" content="0; url=/moved">'),
            ("https://a.com/p/5",
             b"<meta content=\"5, url='https://b.org/n'\" HTTP-EQUIV='REFRESH'>"),
            ("https://a.com/p/6",
             b'<meta http-equiv="refresh" content="30">'),  # delay-only
            ("https://a.com/p/7", b"<p>nothing declared</p>"),
            ("https://a.com/p/8",
             b'<link rel="canonical" href="#frag">'),  # unusable
        ],
        "url string, html binary",
    )
    got = {
        r["url"]: (r["canonical"], r["refresh_url"])
        for r in meta_refresh_target(rel_canonical(pages)).collect()
    }
    assert got["https://a.com/p/1"] == ("https://a.com/c/1", "")
    assert got["https://a.com/p/2"] == ("https://a.com/c/2", "")
    assert got["https://a.com/p/3"] == ("https://cdn.org/x/c", "")
    assert got["https://a.com/p/4"] == ("", "https://a.com/moved")
    assert got["https://a.com/p/5"] == ("", "https://b.org/n")
    assert got["https://a.com/p/6"] == ("", "")
    assert got["https://a.com/p/7"] == ("", "")
    assert got["https://a.com/p/8"] == ("", "")


def test_anchor_rel_nofollow(spark):
    """rel opt-out tokens (nofollow/ugc/sponsored, any case, anywhere in
    the space-separated rel list) mark the anchor nofollow=true; other
    rel values, rel-less anchors, and lookalike substrings
    (rel="nofollowme") do not."""
    from webx.urls import extract_anchors

    html = (
        b'<a href="/a" rel="nofollow">1</a>'
        b"<a href='/b' rel='ugc me'>2</a>"
        b'<A HREF="/c" REL="SPONSORED noopener">3</A>'
        b'<a rel="noopener" href="/d">4</a>'
        b'<a href="/e">5</a>'
        b'<a href="/f" rel="nofollowme">6</a>'
    )
    pages = spark.createDataFrame([("https://a.com/p", html)],
                                  "url string, html binary")
    got = {r["href"]: r["nofollow"] for r in extract_anchors(pages).collect()}
    assert got == {"/a": True, "/b": True, "/c": True,
                   "/d": False, "/e": False, "/f": False}


def test_host_link_graph_cross_host(spark):
    from webx.urls import extract_links, host_link_graph

    pages = spark.createDataFrame(
        [
            ("https://a.com/p", b'<a href="/x">i</a><a href="https://b.com/y">o</a>'
             b'<a href="#top">f</a>'),
        ],
        "url string, html binary",
    )
    edges = {
        (r["src_host"], r["dst_host"]): r["n_links"]
        for r in host_link_graph(extract_links(pages)).collect()
    }
    # fragment link dropped; one self-loop, one cross-host edge
    assert edges == {("a.com", "a.com"): 1, ("a.com", "b.com"): 1}


def test_lm_perplexity_matches_python_reference(spark):
    import math
    import re

    from webx.curate import lm_perplexity

    train_rows = [
        "the cat sat on the mat",
        "the dog sat on the rug",
        "a cat and a dog",
    ]
    doc_rows = [
        (1, "the cat sat on the mat"),   # pure train text: low ppl
        (2, "zebra quark flux omega"),   # all-unseen: high ppl
        (3, "the dog"),                  # one seen bigram
        (4, "single"),                   # < 2 tokens: null ppl
        (5, ""),                         # empty
    ]
    docs = spark.createDataFrame(doc_rows, "doc_id long, text string")
    train = spark.createDataFrame([(t,) for t in train_rows], "text string")
    got = {r["doc_id"]: r for r in lm_perplexity(docs, train).collect()}

    def toks(t):
        t = t.strip()
        return [w.lower() for w in re.split(r"[ \t\r\n]+", t)] if t else [""]

    c2, c1 = {}, {}
    vocab = set()
    for t in train_rows:
        ws = toks(t)
        vocab.update(ws)
        for a, b in zip(ws, ws[1:]):
            c2[(a, b)] = c2.get((a, b), 0) + 1
            c1[a] = c1.get(a, 0) + 1
    v = len(vocab) + 1

    for doc_id, text in doc_rows:
        ws = toks(text)
        bgs = list(zip(ws, ws[1:]))
        row = got[doc_id]
        assert row["n_bigrams"] == len(bgs)
        if not bgs:
            assert row["ppl"] is None and row["logprob"] is None
            assert row["bg_mass"] == 0 and row["ctx_mass"] == 0
            continue
        assert row["bg_mass"] == sum(c2.get(bg, 0) for bg in bgs)
        assert row["ctx_mass"] == sum(c1.get(bg[0], 0) for bg in bgs)
        lp = sum(
            math.log((c2.get(bg, 0) + 1) / (c1.get(bg[0], 0) + v)) for bg in bgs
        )
        assert abs(row["logprob"] - lp) < 1e-9 * max(1, abs(lp))
        assert abs(row["ppl"] - math.exp(-lp / len(bgs))) < 1e-9 * row["ppl"]

    # the CCNet property the filter exists for: in-domain text scores
    # lower perplexity than gibberish
    assert got[1]["ppl"] < got[2]["ppl"]


def test_lm_perplexity_min_count_prunes_model(spark):
    from webx.curate import lm_perplexity

    train = spark.createDataFrame(
        [("x y x y",), ("p q",)], "text string"
    )  # bigram counts: (x,y)=2, (y,x)=1, (p,q)=1
    docs = spark.createDataFrame([(1, "x y"), (2, "p q")], "doc_id long, text string")
    got = {
        r["doc_id"]: r
        for r in lm_perplexity(docs, train, min_count=2).collect()
    }
    assert got[1]["bg_mass"] == 2       # (x,y) survives pruning
    assert got[2]["bg_mass"] == 0       # (p,q) pruned -> unseen
    assert got[2]["ctx_mass"] == 0


def test_c4_clean_rules(spark):
    from webx.curate import c4_clean

    docs = spark.createDataFrame(
        [
            # 3 good lines -> kept, keep=True
            (1, 'One good sentence right here now.\nAnother full sentence ends with bang!\nIs this a proper question line?'),
            # terminal-punct rule: middle line dropped
            (2, "Alpha beta gamma delta epsilon.\nno terminal punctuation on this line\nZeta eta theta iota kappa.\nLambda mu nu xi omicron?"),
            # min-words rule: short line dropped -> only 2 survive -> keep=False
            (3, 'First proper sentence has five words.\nshort.\nSecond proper sentence has five words!'),
            # lorem ipsum page flagged
            (4, 'One good sentence right here now.\nAnother full sentence ends with bang!\nIs this a proper question line?\nlorem ipsum dolor sit amet friend.'),
            # curly brace page flagged
            (5, 'One good sentence right here now.\nAnother full sentence ends with bang!\nfunction f() { return 1; } is code here.\nIs this a proper question line?'),
            # end-quote counts as terminal punctuation
            (6, 'He said the whole quote aloud."\nAnother full sentence ends with bang!\nIs this a proper question line?'),
            (7, None),  # null page
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in c4_clean(docs).collect()}
    assert got[1]["keep"] and got[1]["n_kept"] == 3 and got[1]["text"] == docs.collect()[0]["text"]
    assert got[2]["n_lines"] == 4 and got[2]["n_kept"] == 3
    assert "no terminal punctuation" not in got[2]["text"]
    assert not got[3]["keep"] and got[3]["n_kept"] == 2
    assert not got[4]["keep"] and got[4]["n_kept"] == 4  # lines fine, page flagged
    assert not got[5]["keep"]
    assert got[6]["keep"] and got[6]["n_kept"] == 3
    assert got[7]["n_kept"] == 0 and got[7]["text"] == "" and not got[7]["keep"]


def test_extract_anchors_text_and_pairing(spark):
    from webx.urls import anchor_text_index, extract_anchors

    html = (
        b'<html><body>'
        b'<a href="/a">Plain text</a>'
        b'<a class="x" href="/b"><b>Bold</b> and <i>italic</i></a>'
        b'<a href="mailto:x@y.z">Mail me</a>'
        b'<a href="sub/page.html">Relative\n  link</a>'
        b'</body></html>'
    )
    pages = spark.createDataFrame(
        [("https://h1.example.com/dir/p.html", bytearray(html))],
        "url string, html binary",
    )
    got = extract_anchors(pages).collect()
    by_href = {r["href"]: r for r in got}
    assert by_href["/a"]["anchor"] == "Plain text"
    assert by_href["/b"]["anchor"] == "Bold and italic"  # tags stripped, ws collapsed
    assert by_href["/a"]["resolved"] == "https://h1.example.com/a"
    assert by_href["mailto:x@y.z"]["resolved"] is None
    assert by_href["sub/page.html"]["anchor"] == "Relative link"
    assert by_href["sub/page.html"]["resolved"] == "https://h1.example.com/dir/sub/page.html"

    idx = {(r["resolved"], r["anchor"]): r for r in anchor_text_index(extract_anchors(pages)).collect()}
    assert idx[("https://h1.example.com/a", "Plain text")]["n_refs"] == 1
    assert ("https://h1.example.com/a", "Plain text") in idx
    assert all(k[0] is not None for k in idx)  # mailto dropped


# ------------------------------------------------- host boilerplate strip

def _hb_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, host string, text string")


def test_strip_host_boilerplate_removes_template_keeps_unique(spark):
    from webx.curate import strip_host_boilerplate

    slogan = "Subscribe now"
    rows = [(i, "a.com", f"body {i}\n{slogan}") for i in range(5)]
    rows += [(9, "b.com", f"other\n{slogan}")]  # below threshold on b.com
    out = {
        r["doc_id"]: r
        for r in strip_host_boilerplate(
            _hb_docs(spark, rows), min_docs=5
        ).collect()
    }
    for i in range(5):
        assert out[i]["text"] == f"body {i}"
        assert out[i]["n_removed"] == 1
        assert out[i]["n_paragraphs"] == 2
    # b.com has only one doc with the slogan: kept (cross-host repeats
    # are not template signal).
    assert out[9]["text"] == f"other\n{slogan}"
    assert out[9]["n_removed"] == 0


def test_strip_host_boilerplate_counts_distinct_docs_not_occurrences(spark):
    from webx.curate import strip_host_boilerplate

    # One doc repeating a paragraph 5 times is NOT host boilerplate.
    rows = [(1, "a.com", "x\nx\nx\nx\nx"), (2, "a.com", "y")]
    out = {
        r["doc_id"]: r
        for r in strip_host_boilerplate(
            _hb_docs(spark, rows), min_docs=5
        ).collect()
    }
    assert out[1]["text"] == "x\nx\nx\nx\nx"
    assert out[1]["n_removed"] == 0


def test_strip_host_boilerplate_all_removed_yields_empty(spark):
    from webx.curate import strip_host_boilerplate

    rows = [(i, "a.com", "only para") for i in range(6)]
    out = strip_host_boilerplate(_hb_docs(spark, rows), min_docs=5).collect()
    assert all(r["text"] == "" and r["n_removed"] == 1 for r in out)


def test_pagination_and_feed_links(spark):
    """next/prev rails base-resolved ('' when undeclared; PREVIOUS
    long-form and any case accepted); feed autodiscovery yields one row
    per rss/atom alternate and ignores stylesheets and feedless
    pages."""
    from webx.urls import feed_links, pagination_links

    pages = spark.createDataFrame(
        [
            ("https://a.com/art/p2",
             b'<link rel="next" href="p3"><link rel=\'prev\' href=\'/art/p1\'>'
             b'<link rel="alternate" type="application/rss+xml" href="/feed.rss">'
             b"<link type='application/atom+xml' href='/feed.atom' rel='alternate'>"
             b'<link rel="stylesheet" href="/site.css">'),
            ("https://a.com/last",
             b'<LINK REL="PREVIOUS" HREF="/art/p9">'),
            ("https://a.com/plain", b"<p>no links</p>"),
        ],
        "url string, html binary",
    )
    rails = {r["url"]: (r["next_url"], r["prev_url"])
             for r in pagination_links(pages).collect()}
    assert rails["https://a.com/art/p2"] == \
        ("https://a.com/art/p3", "https://a.com/art/p1")
    assert rails["https://a.com/last"] == ("", "https://a.com/art/p9")
    assert rails["https://a.com/plain"] == ("", "")
    feeds = {(r["feed_kind"]): r["feed_url"] for r in feed_links(pages).collect()}
    assert feeds == {"rss": "https://a.com/feed.rss",
                     "atom": "https://a.com/feed.atom"}


def test_url_templates_and_traps(spark):
    """Numeric → {n}, hex ids → {h}, names verbatim; repeat/depth/param
    trap flags fire independently; a clean url raises none."""
    from webx.urls import url_path_template, url_trap_signals

    rows = [
        ("https://a.com/article/8372/comments", "/article/{n}/comments"),
        ("https://a.com/u/deadbeef-1234-f00d/x", "/u/{h}/x"),
        ("https://a.com/u/cafe/x", "/u/cafe/x"),  # short hex: verbatim
        ("https://a.com/2024/06/17/post", "/{n}/{n}/{n}/post"),
        ("https://a.com/", "/"),
        ("https://a.com/p?page=2", "/p"),
    ]
    d = spark.createDataFrame([(u,) for u, _ in rows], "url string")
    got = [r["t"] for r in d.select(url_path_template(F.col("url")).alias("t")).collect()]
    assert got == [t for _, t in rows]
    traps = spark.createDataFrame(
        [
            ("https://a.com/cal/cal/2024",),
            ("https://a.com/a/b/c/d/e/f/g/h/i/j",),
            ("https://a.com/s?a=1&b=2&c=3&d=4&e=5&f=6",),
            ("https://a.com/fine/path?x=1",),
        ],
        "url string",
    )
    out = [tuple(r) for r in url_trap_signals(traps).select(
        "trap_repeat", "trap_depth", "trap_params", "is_trap").collect()]
    assert out == [
        (True, False, False, True),
        (False, True, False, True),
        (False, False, True, True),
        (False, False, False, False),
    ]


def test_curate_pipeline_funnel_invariants(spark):
    """End-to-end composed funnel (q_curate_pipeline): stage effects are
    visible in the output — mirrors collapsed at exact dedup (no
    mirror.example.net host), near-dup variants lose to their longer
    base (no alt host whose base survived), the host cap holds, packing
    respects max_tokens with each host's bins dense from 0."""
    import __spark_entry__ as E

    out = E.q_curate_pipeline(spark, "/root/testdata/sf0.001").toPandas()
    assert len(out) > 0
    assert "mirror.example.net" not in set(out["host"])
    per_host = out.groupby("host").size()
    assert (per_host <= 40).all()
    # alt survivors (doc_id >= 1e6) only exist when their base is absent
    alts = set(out[out.doc_id >= 1_000_000].doc_id - 1_000_000)
    bases = set(out[out.doc_id < 1_000_000].doc_id)
    assert not (alts & bases)
    # packing: per (host, bin) token totals fit 512 unless a single doc
    # overflows alone; bins are dense starting at 0
    g = out.groupby(["host", "bin"])["n_tokens"].agg(["sum", "count"])
    over = g[(g["sum"] > 512) & (g["count"] > 1)]
    assert over.empty
    for h, grp in out.groupby("host"):
        bins = sorted(grp["bin"].unique())
        assert bins == list(range(len(bins)))
