"""TextTiling segmentation (webx/textstats.py texttiling_boundaries)."""

from __future__ import annotations

import math
import random

from webx.textstats import texttiling_boundaries

BLOCK = 10


def _ref(text):
    toks = [w for w in text.split() if w]
    blocks = {}
    for i, w in enumerate(toks):
        blocks.setdefault(i // BLOCK, []).append(w)
    nb = len(blocks)
    gaps = []
    for b in range(nb - 1):
        c1, c2 = {}, {}
        for w in blocks[b]:
            c1[w] = c1.get(w, 0) + 1
        for w in blocks[b + 1]:
            c2[w] = c2.get(w, 0) + 1
        num = sum(c1[w] * c2.get(w, 0) for w in c1)
        den = sum(v * v for v in c1.values()) * sum(v * v for v in c2.values())
        gaps.append((b, num, den))
    out = {}
    for i, (b, num, den) in enumerate(gaps):
        if i == 0 or i == len(gaps) - 1:
            out[b] = (num, den, 0)
            continue
        _, pn, pd = gaps[i - 1]
        _, nn, nd = gaps[i + 1]
        cos = num / math.sqrt(den)
        is_min = cos < gaps[i - 1][1] / math.sqrt(gaps[i - 1][2]) and cos < gaps[
            i + 1
        ][1] / math.sqrt(gaps[i + 1][2])
        out[b] = (num, den, 1 if is_min else 0)
    return out


def test_matches_float_reference_on_random_docs(spark):
    rng = random.Random(23)
    vocab_a = ["cat", "dog", "pet", "fur", "paw"]
    vocab_b = ["stock", "bond", "yield", "rate", "fund"]
    texts = []
    for _ in range(25):
        # topic A block, then topic B block: a valley must appear
        words = [rng.choice(vocab_a) for _ in range(rng.randint(25, 40))]
        words += [rng.choice(vocab_b) for _ in range(rng.randint(25, 40))]
        texts.append(" ".join(words))
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = texttiling_boundaries(df, block=BLOCK).collect()
    got = {(r.doc_id, r.gap_idx): (r.num, r.den, r.boundary) for r in rows}
    found_boundary = 0
    for i, t in enumerate(texts):
        want = _ref(t)
        for b, (num, den, bd) in want.items():
            assert got[(i, b)] == (num, den, bd), (i, b)
        found_boundary += sum(bd for _, _, bd in want.values())
    assert found_boundary > 0  # the corpus genuinely exercises valleys


def test_topic_shift_creates_valley(spark):
    text = " ".join(["cat"] * 30 + ["bond"] * 30)
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    rows = sorted(
        texttiling_boundaries(df, block=BLOCK).collect(), key=lambda r: r.gap_idx
    )
    # gap 2 spans the cat->bond switch (blocks 2 and 3): zero cohesion,
    # flanked by perfect-cohesion gaps -> strict minimum
    assert [r.boundary for r in rows] == [0, 0, 1, 0, 0]
    assert rows[2].num == 0


def test_uniform_doc_has_no_boundary(spark):
    df = spark.createDataFrame(
        [(0, " ".join(["same"] * 60))], "doc_id long, text string"
    )
    rows = texttiling_boundaries(df, block=BLOCK).collect()
    assert all(r.boundary == 0 for r in rows)
