"""Content-defined chunking (gear-hash CDC) + chunk-level dedup.

Fixed-size blocking breaks the moment one byte is inserted: every
block boundary after the edit shifts, and nothing downstream matches.
Content-defined chunking (the LBFS/rsync/FastCDC family) places
boundaries where a rolling hash of the last w bytes satisfies a
predicate — boundaries are properties of the CONTENT, so two documents
that share a long tail after divergent prefixes still split into
identical chunks, and chunk-level dedup recovers the overlap. That is
the storage-layer sibling of the shingle/MinHash dedup in
webx/dedup.py, and the standard way to dedupe near-identical crawled
snapshots at the byte level (CommonCrawl revisits, boilerplate-shifted
re-renders).

Rolling hash: the gear construction —

    h[i] = (h[i-1] << 1  +  gear[b[i]])  mod 2^64

so position i's hash is ``sum_{j=0..63} gear[b[i-j]] << j (mod 2^64)``
(older bytes shift out of the 64-bit word: a true 64-byte window with
no subtraction). The gear table is ``xxh64(byte value)`` via the
repo's Spark-compatible XXH64 (webx/xxh64.py hash_long), so the DuckDB
oracle can replay every hash from the same 256 deterministic constants
(the hyperplane-literal convention of webx/similarity.hyperplanes).
A boundary is declared where the TOP ``nbits`` of h are zero
(``h < 2^(64-nbits)``, expected chunk length 2^nbits): the high bits
mix contributions from the whole window, while the low bits depend
only on the last few bytes — masking high bits is the standard gear
refinement (FastCDC's observation).

Scale shape: chunking is embarrassingly parallel (one Arrow-batched
``mapInPandas``, 64 vectorized adds per batch — no per-byte Python);
dedup is ONE hash aggregate on the chunk key. At crawl scale you group
on ``xxhash64(chunk)`` (8 bytes on the wire, computed JVM-side); the
oracle groups on chunk CONTENT, which is equal grouping unless two
distinct ~64-byte chunks collide in 64 bits (~1e-12 at 1e4 chunks;
at 10^12 chunks use a 128/256-bit digest, same plan shape).

Reference analog: DBNet's region proposals split a page into
content-determined segments the same way — boundaries from local
evidence, not a fixed grid (mindocr/postprocess/det_db_postprocess.py
box extraction); chunking is that idea applied to byte streams.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import numpy as np
from pyspark.sql import DataFrame, functions as F

from webx.xxh64 import hash_long

# deterministic 256-entry gear table: xxh64(byte value as long, seed 42)
GEAR = np.array([hash_long(b) for b in range(256)], dtype=np.uint64)

_CHUNK_SCHEMA = (
    "doc_id long, chunk_idx int, start int, length int, chunk string"
)


def _boundaries(data: bytes, nbits: int) -> np.ndarray:
    """0-based positions i where the gear hash over bytes[..i] has its
    top ``nbits`` bits zero. Vectorized: 64 shifted adds, uint64
    wraparound = mod 2^64."""
    b = np.frombuffer(data, dtype=np.uint8)
    n = len(b)
    h = np.zeros(n, dtype=np.uint64)
    g = GEAR[b]
    for j in range(min(64, n)):
        if j:
            h[j:] += g[:-j] << np.uint64(j)
        else:
            h += g
    return np.nonzero(h < np.uint64(1) << np.uint64(64 - nbits))[0]


def cdc_chunks(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    nbits: int = 6,
) -> DataFrame:
    """Split ``text_col`` (UTF-8 bytes) into content-defined chunks.

    Returns (doc_id, chunk_idx, start, length, chunk): ``start``/
    ``length`` are BYTE offsets; ``chunk`` is the decoded substring
    (boundaries always land on byte positions; for the ASCII corpora
    here byte==char offsets — multibyte payloads should chunk the
    ``binary`` column and keep chunks as bytes).
    """
    nb = int(nbits)
    sel = df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))

    def fn(batches: Iterable) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out_id, out_idx, out_start, out_len, out_chunk = [], [], [], [], []
            for did, text in zip(pdf["doc_id"].values, pdf["text"].values):
                data = text.encode("utf-8")
                cuts = _boundaries(data, nb)
                ends = [int(c) + 1 for c in cuts]
                if not ends or ends[-1] != len(data):
                    ends.append(len(data))
                prev = 0
                for idx, e in enumerate(ends):
                    out_id.append(did)
                    out_idx.append(idx)
                    out_start.append(prev)
                    out_len.append(e - prev)
                    out_chunk.append(data[prev:e].decode("utf-8"))
                    prev = e
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out_id, dtype="int64"),
                    "chunk_idx": pd.Series(out_idx, dtype="int32"),
                    "start": pd.Series(out_start, dtype="int32"),
                    "length": pd.Series(out_len, dtype="int32"),
                    "chunk": pd.Series(out_chunk, dtype="object"),
                }
            )

    return sel.mapInPandas(fn, schema=_CHUNK_SCHEMA)


def cdc_dedup_stats(chunks: DataFrame) -> DataFrame:
    """Per-document chunk-dedup accounting: how much of each document's
    byte mass is recoverable from chunks that also occur in OTHER
    documents. One aggregate over the chunk key (count + distinct-doc
    count via the two-level trick), one broadcast-scale join back.

    Output: (doc_id, n_chunks, n_shared_chunks, bytes, shared_bytes).
    """
    keyed = chunks.withColumn("ck", F.xxhash64("chunk"))
    spread = keyed.groupBy("ck").agg(
        F.count_distinct("doc_id").alias("n_docs")
    )
    return (
        keyed.join(spread, "ck")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_chunks"),
            F.sum((F.col("n_docs") > 1).cast("long")).alias("n_shared_chunks"),
            F.sum("length").cast("long").alias("bytes"),
            F.sum(
                F.when(F.col("n_docs") > 1, F.col("length")).otherwise(0)
            ).cast("long").alias("shared_bytes"),
        )
    )
