"""Stage-1 detector micro-goldens (the DBPostprocess-analog unit tests,
modeled on the reference's hand-computed metric goldens,
tests/ut/test_metrics.py:28-63)."""

from __future__ import annotations

import numpy as np

from webx.config import ExtractConfig
from webx.detect import Span, block_scores, detect, merge_runs, validate_spans
from webx.tokenize import tokenize

CFG = ExtractConfig()


def test_block_scores_plain_text_high():
    s = block_scores(
        np.array([100]), np.array([0]), np.array([0]), np.array([False]), CFG
    )
    assert s[0] > 0.95


def test_block_scores_link_farm_zero():
    # all text inside links -> density * (1 - 1.0) == 0
    s = block_scores(
        np.array([50]), np.array([50]), np.array([2]), np.array([False]), CFG
    )
    assert s[0] == 0.0


def test_block_scores_boiler_zeroed():
    s = block_scores(
        np.array([100]), np.array([0]), np.array([0]), np.array([True]), CFG
    )
    assert s[0] == 0.0


def test_block_scores_tag_heavy_penalized():
    light = block_scores(np.array([40]), np.array([0]), np.array([0]), np.array([False]), CFG)
    heavy = block_scores(np.array([40]), np.array([0]), np.array([20]), np.array([False]), CFG)
    assert heavy[0] < light[0] < 1.0


def test_detect_end_to_end_picks_article():
    html = (
        b"<nav><li><a href='/'>Home</a></li><li><a href='/a'>About</a></li></nav>"
        b"<h1>A Real Headline Here</h1>"
        b"<p>This is the long main content paragraph with plenty of text to score.</p>"
        b"<footer><p>(c) corp</p></footer>"
    )
    blocks = tokenize(html)
    spans = detect(blocks, CFG)
    assert len(spans) == 1
    s = spans[0]
    assert html[s.start : s.start + 4] == b"<h1>"[0:0] + html[s.start : s.start + 4]
    # span covers headline through paragraph, not nav/footer
    assert b"Real Headline" in html[s.start : s.end]
    assert b"main content" in html[s.start : s.end]
    assert b"Home" not in html[s.start : s.end]
    assert b"corp" not in html[s.start : s.end]


def test_merge_runs_respects_min_span_chars():
    html = b"<p>tiny</p>"
    blocks = tokenize(html)
    spans = detect(blocks, CFG)  # min_span_chars=25 default
    assert spans == []


def test_merge_gap_bridges_noncandidates():
    html = (
        b"<p>First long candidate paragraph with enough text body.</p>"
        b"<p><a href='/x'>pure link</a></p>"
        b"<p>Second long candidate paragraph with enough text body.</p>"
    )
    blocks = tokenize(html)
    cfg0 = ExtractConfig(merge_gap=0)
    cfg1 = ExtractConfig(merge_gap=1)
    assert len(detect(blocks, cfg0)) == 2
    spans = detect(blocks, cfg1)
    assert len(spans) == 1
    assert spans[0].first_block == 0 and spans[0].last_block == 2


def test_max_candidates_cap():
    html = b"".join(
        b"<p>Paragraph number %d with sufficient textual content inside.</p>" % i
        for i in range(10)
    ) + b"<div><a href='/'>" + b"x" * 5 + b"</a></div>" * 1
    blocks = tokenize(html)
    cfg = ExtractConfig(max_candidates=3, merge_gap=0)
    # each <p> is its own span (separated only by block tags, no gap blocks)
    spans = detect(blocks, cfg)
    assert len(spans) <= 3


def test_validate_spans_clips_and_drops():
    spans = [
        Span(-5, 10, 0.9, "content", 0, 0),
        Span(5, 500, 0.9, "content", 1, 1),
        Span(50, 40, 0.9, "content", 2, 2),  # inverted -> dropped
        Span(100, 100, 0.9, "content", 3, 3),  # empty -> dropped
    ]
    out = validate_spans(spans, 100)
    assert [(s.start, s.end) for s in out] == [(0, 10), (5, 100)]


def test_span_sorted_nonoverlapping_invariant():
    # property from SURVEY §5: spans sorted by start, non-overlapping
    html = (
        b"<p>First long candidate paragraph with enough text body one.</p>"
        b"<div><a href='/b'>buy</a> <a href='/c'>cart</a></div>"
        b"<p>Second long candidate paragraph with enough text body two.</p>"
    )
    spans = detect(tokenize(html), CFG)
    assert len(spans) == 2
    assert spans[0].start < spans[0].end <= spans[1].start < spans[1].end


def test_heading_kind():
    html = b"<h1>A Standalone Heading With Plenty Of Characters</h1>"
    spans = detect(tokenize(html), CFG)
    assert len(spans) == 1 and spans[0].kind == "heading"
