"""Content-defined chunking (webx/cdc.py) vs a per-byte reference."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from webx.cdc import GEAR, _boundaries, cdc_chunks, cdc_dedup_stats

M64 = (1 << 64) - 1


def _ref_boundaries(data: bytes, nbits: int):
    """The sequential recurrence h = (h<<1 + gear[b]) mod 2^64 —
    byte-at-a-time, the definition the vectorized kernel must match."""
    h, out = 0, []
    for i, b in enumerate(data):
        h = ((h << 1) + int(GEAR[b])) & M64
        if h < 1 << (64 - nbits):
            out.append(i)
    return out


def test_vectorized_matches_sequential_recurrence():
    rng = random.Random(3)
    for trial in range(40):
        n = rng.randint(0, 400)
        data = bytes(rng.randrange(256) for _ in range(n))
        for nbits in (4, 6, 8):
            assert list(_boundaries(data, nbits)) == _ref_boundaries(data, nbits), (
                trial,
                nbits,
            )


def test_chunks_reassemble_exactly(spark):
    rng = random.Random(5)
    texts = [
        "".join(rng.choice("abcdefgh ") for _ in range(rng.randint(1, 500)))
        for _ in range(30)
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = cdc_chunks(df, nbits=5).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for did, chunks in by_doc.items():
        chunks.sort(key=lambda r: r.chunk_idx)
        assert chunks[0].start == 0
        for a, b in zip(chunks, chunks[1:]):
            assert a.start + a.length == b.start
        assert "".join(c.chunk for c in chunks) == texts[did]
        assert all(c.length > 0 for c in chunks)


def test_shifted_twin_tails_dedupe(spark):
    """The CDC selling point: insert a prefix, the tail chunks still
    match — fixed blocks would share nothing."""
    rng = random.Random(9)
    body = "".join(rng.choice("abcdefgh ") for _ in range(3000))
    df = spark.createDataFrame(
        [(0, body), (1, "fourteen bytes " + body)], "doc_id long, text string"
    )
    stats = {
        r.doc_id: r
        for r in cdc_dedup_stats(cdc_chunks(df, nbits=5)).collect()
    }
    # the mismatch region is bounded: the 15 edited bytes + the 64-byte
    # hash window + the (geometric, mean 32) wait for the next common
    # boundary — everything after re-aligns, so the overwhelming
    # majority of both docs' bytes dedupe
    for did in (0, 1):
        assert stats[did].n_shared_chunks >= stats[did].n_chunks - 10
        assert stats[did].shared_bytes > 0.8 * stats[did].bytes


def test_disjoint_docs_share_nothing(spark):
    df = spark.createDataFrame(
        [(0, "aaaa bbbb cccc " * 30), (1, "zzzz yyyy xxxx " * 30)],
        "doc_id long, text string",
    )
    stats = {
        r.doc_id: r
        for r in cdc_dedup_stats(cdc_chunks(df, nbits=5)).collect()
    }
    # within-doc repeats may dedupe against the OTHER doc only; these
    # alphabets are disjoint so cross-doc sharing is impossible — but
    # n_docs counts distinct docs, so identical chunks inside one doc
    # do NOT count as shared
    assert stats[0].n_shared_chunks == 0
    assert stats[1].n_shared_chunks == 0


def test_expected_chunk_length_tracks_nbits(spark):
    rng = random.Random(13)
    text = "".join(rng.choice("abcdefghijklmnop") for _ in range(20000))
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    n5 = cdc_chunks(df, nbits=5).count()
    n7 = cdc_chunks(df, nbits=7).count()
    assert n5 > 2 * n7  # avg chunk 32 vs 128 bytes
