"""Stage 1 — block-level boilerplate detector (the DBPostprocess analog).

Maps the reference's dense-score-map → threshold → contours → scored
polygons pipeline (mindocr/postprocess/det_postprocess.py:13-145) onto a
block table:

* per-block score = text_density × (1 − link_density)   (the score map)
* ``score >= binary_thresh``                              (binarization, :42)
* merge contiguous candidate runs into spans              (findContours, :53)
* span score = text-length-weighted mean block score      (_calc_score, :137-145)
* ``span_score >= box_thresh`` + min-size filter          (:63-64, :72-74)
* ``max_candidates`` cap                                  (:60)

Scoring is numpy-vectorized over the *flattened block table of an entire
Arrow batch* (all documents at once); only run-merging walks per-document
boundaries. Deterministic: pure float arithmetic with fixed tie-breaking
(block order = byte order).
"""

from __future__ import annotations

from typing import List, NamedTuple, Sequence

import numpy as np

from webx.config import ExtractConfig
from webx.tokenize import Block


class Span(NamedTuple):
    start: int          # byte offset into html (inclusive)
    end: int            # byte offset (exclusive)
    score: float
    kind: str           # 'content' | 'heading'
    first_block: int    # index into the doc's block list
    last_block: int


def block_scores(
    tlen: np.ndarray,
    link_tlen: np.ndarray,
    tag_cnt: np.ndarray,
    boiler: np.ndarray,
    cfg: ExtractConfig,
) -> np.ndarray:
    """Vectorized per-block score in [0, 1]; structural boilerplate → 0."""
    tl = tlen.astype(np.float64)
    density = tl / (tl + cfg.tag_weight * tag_cnt.astype(np.float64) + 1.0)
    link_density = link_tlen.astype(np.float64) / np.maximum(tl, 1.0)
    score = density * (1.0 - link_density)
    score[boiler] = 0.0
    return score


def merge_runs(
    blocks: Sequence[Block],
    scores: np.ndarray,
    cfg: ExtractConfig,
    tlen: np.ndarray | None = None,
) -> List[Span]:
    """Merge consecutive candidate blocks of ONE document into scored
    spans (Block-list convenience wrapper over merge_runs_table)."""
    n = len(blocks)
    if n == 0:
        return []
    if tlen is None:
        tlen = np.fromiter((b.tlen for b in blocks), dtype=np.int64, count=n)
    start = np.fromiter((b.start for b in blocks), dtype=np.int64, count=n)
    end = np.fromiter((b.end for b in blocks), dtype=np.int64, count=n)
    heading = np.fromiter((b.heading for b in blocks), dtype=bool, count=n)
    link = np.fromiter((b.link_tlen for b in blocks), dtype=np.int64, count=n)
    return merge_runs_table(start, end, tlen, heading, scores, cfg, link=link)


def _gap_runs(cand: np.ndarray, merge_gap: int) -> list:
    """(first, last) candidate runs bridging up to merge_gap holes —
    the original per-block walk, kept for the merge_gap > 0 path."""
    n = len(cand)
    out = []
    i = 0
    while i < n:
        if not cand[i]:
            i += 1
            continue
        j = i
        last = i
        while j + 1 < n:
            k = j + 1
            gap = 0
            while k < n and not cand[k] and gap < merge_gap:
                k += 1
                gap += 1
            if k < n and cand[k]:
                j = k
                last = k
            else:
                break
        out.append((i, last))
        i = last + 1
    return out


def merge_runs_table(
    start: np.ndarray,
    end: np.ndarray,
    tlen: np.ndarray,
    heading: np.ndarray,
    scores: np.ndarray,
    cfg: ExtractConfig,
    link: np.ndarray | None = None,
) -> List[Span]:
    """Array-native merge: run boundaries found with one vectorized diff
    (merge_gap=0, the default) instead of a per-block Python walk; the
    per-run score arithmetic is the EXACT expressions of the original
    loop, so results are bit-identical.

    Heading rescue (FROZEN RULE — the C kernel `wx_detect` and the synth
    oracle arithmetic implement the identical predicate): with
    ``cand_base = (score >= binary_thresh) & (tlen >= min_block_chars)``,
    a block ``i`` is rescued into candidacy iff

        not cand_base[i]  and  cand_base[i+1]        (directly precedes
                                                      base content)
        and link[i] == 0                             (a headline is not
                                                      a link)
        and min_block_chars <= tlen[i] <= rescue_max_chars
        and 0.0 < score[i]  and  score[i] >= rescue_thresh

    The i+1 test is against BASE candidacy (single pass, no chaining:
    stacked headlines rescue only the last). ``score > 0`` keeps boiler
    blocks (forced to 0.0) out even under a zero rescue_thresh. The rule
    is the boilerpipe/readability "headline preceding content" heuristic
    recast over the block table: 1990s table/font newsletters express
    headings as ``<font><b>…</b></font><br>`` whose inline-tag density
    fails binary_thresh while the text itself is real content. Rescue is
    skipped when ``link`` is None (legacy callers) or
    ``rescue_max_chars == 0``."""
    n = len(tlen)
    if n == 0:
        return []
    cand = (scores >= cfg.binary_thresh) & (tlen >= cfg.min_block_chars)
    if cfg.rescue_max_chars > 0 and link is not None and n > 1:
        resc = (
            ~cand[:-1]
            & cand[1:]
            & (link[:-1] == 0)
            & (tlen[:-1] >= cfg.min_block_chars)
            & (tlen[:-1] <= cfg.rescue_max_chars)
            & (scores[:-1] > 0.0)
            & (scores[:-1] >= cfg.rescue_thresh)
        )
        if resc.any():
            cand = cand.copy()
            cand[:-1] |= resc
    if cfg.merge_gap == 0:
        if n < 64:
            # typical pages have O(10) blocks: a list walk beats numpy's
            # per-call overhead (np.diff costs more than the whole doc)
            cl = cand.tolist()
            pairs = []
            i = 0
            while i < n:
                if cl[i]:
                    j = i
                    while j + 1 < n and cl[j + 1]:
                        j += 1
                    pairs.append((i, j))
                    i = j + 1
                else:
                    i += 1
        else:
            c = cand.astype(np.int8)
            run_starts = np.nonzero(np.diff(c, prepend=np.int8(0)) == 1)[0]
            run_ends = np.nonzero(np.diff(c, append=np.int8(0)) == -1)[0]
            pairs = zip(run_starts.tolist(), run_ends.tolist())
    else:
        pairs = _gap_runs(cand, cfg.merge_gap)

    return _finalize_runs(start, end, tlen, heading, scores, pairs, cfg)


def _finalize_runs(
    start: np.ndarray,
    end: np.ndarray,
    tlen: np.ndarray,
    heading: np.ndarray,
    scores: np.ndarray,
    pairs,
    cfg: ExtractConfig,
) -> List[Span]:
    """Per-run weighted-score finalization — the one float reduction in
    stage 1 (np.dot), shared by the Python run walk and the fused C
    candidate-run path (webx/ctokenize.detect_table) so both produce
    bit-identical span scores."""
    spans: List[Span] = []
    for i, last in pairs:
        if last == i:
            # single-block run (the common case): np.dot of a 1-element
            # pair IS the scalar product, and w.sum() IS w — the two
            # IEEE ops below are the identical operations, so this path
            # is bit-identical to the array path by construction
            w1 = float(tlen[i])
            sc = float(scores[i]) * w1 / max(w1, 1.0)
            span_tlen = int(w1)
            head_all = bool(heading[i])
        else:
            run = slice(i, last + 1)
            w = tlen[run].astype(np.float64)
            ws = w.sum()
            sc = float(np.dot(scores[run], w) / max(ws, 1.0))
            span_tlen = int(ws)
            head_all = bool(heading[run].all())
        if sc >= cfg.box_thresh and span_tlen >= cfg.min_span_chars:
            kind = "heading" if head_all else "content"
            spans.append(
                Span(int(start[i]), int(end[last]), sc, kind, int(i), int(last))
            )

    if len(spans) > cfg.max_candidates:
        spans = spans[: cfg.max_candidates]
    return spans


def detect(blocks: Sequence[Block], cfg: ExtractConfig) -> List[Span]:
    """Single-document convenience wrapper (tests / debug)."""
    if not blocks:
        return []
    n = len(blocks)
    tlen = np.fromiter((b.tlen for b in blocks), dtype=np.int64, count=n)
    link = np.fromiter((b.link_tlen for b in blocks), dtype=np.int64, count=n)
    tags = np.fromiter((b.tag_cnt for b in blocks), dtype=np.int64, count=n)
    boiler = np.fromiter((b.boiler for b in blocks), dtype=bool, count=n)
    scores = block_scores(tlen, link, tags, boiler, cfg)
    return merge_runs(blocks, scores, cfg)


_WS_BYTES = frozenset(b" \t\r\n\f\v")


def expand_spans(
    html: bytes, spans: Sequence[Span], expand_ratio: float
) -> List[Span]:
    """The unclip analog (DBPostprocess expand, det_postprocess.py:76-77 /
    expand_poly, det_transforms.py:313-316): widen each span outward into
    the surrounding WHITESPACE bytes only, by at most
    ``expand_ratio * span_len`` per side, never crossing a neighboring
    span. Whitespace-only expansion keeps decoded text byte-identical
    (stage 2 collapses it) while making offsets cover the full visual
    extent — exactly the reference's shrink/unclip asymmetry."""
    if expand_ratio <= 0 or not spans:
        return list(spans)
    out: List[Span] = []
    prev_end = 0
    n = len(html)
    for idx, s in enumerate(spans):
        budget = int((s.end - s.start) * expand_ratio)
        start, end = s.start, s.end
        b = budget
        while start > prev_end and b > 0 and html[start - 1] in _WS_BYTES:
            start -= 1
            b -= 1
        hi = spans[idx + 1].start if idx + 1 < len(spans) else n
        b = budget
        while end < hi and b > 0 and html[end] in _WS_BYTES:
            end += 1
            b -= 1
        out.append(s._replace(start=start, end=end))
        prev_end = end
    return out


def validate_spans(spans: Sequence[Span], doc_len: int) -> List[Span]:
    """Clip spans to [0, doc_len), drop empty/inverted — the
    ``validate_det_res`` invariants (tools/infer/text/predict_det.py:131-187)."""
    out: List[Span] = []
    for s in spans:
        start = max(0, min(s.start, doc_len))
        end = max(0, min(s.end, doc_len))
        if end > start:
            out.append(s._replace(start=start, end=end))
    return out
