"""Hashed n-gram linear classifier — the fastText-shaped quality model.

Production corpus pipelines (CCNet, RefinedWeb, FineWeb) gate documents
with a linear classifier over hashed n-gram features: no vocabulary,
just ``hash(gram) mod D`` into a D-dim weight vector. The *operator
shape* is what matters at 100 TB — and it is pure codegen:

    score(doc) = bias + Σ_grams  W[ pmod(xxhash64(gram), D) ]

* gram strings are built once with ``concat_ws`` and hashed once with
  the JVM ``xxhash64`` — one bulk hash per gram, not per-feature
  arithmetic (the round-3 decontamination A/B showed per-element
  expression trees lose ~2.5× to a single concat+hash);
* the weight vector is an ``array`` LITERAL indexed with
  ``element_at`` inside an ``aggregate`` fold — no join, no shuffle,
  no Python; the whole score fuses into the stage that already scans
  ``text``;
* INTEGER weights (repo policy): the fold is order-independent and
  cross-engine exact, so the DuckDB oracle (webx/oracles.py xxh64
  port) recomputes scores bit-for-bit. A float model would only be
  rows-only checkable.

Training is out of scope (the reference's models are trained offline
too — mindocr/models are inference graphs); weights arrive as data.
``dim`` must be a power of two: the oracle relies on
``pmod(signed_h, D) == unsigned_h % D``, which holds exactly when D
divides 2^64.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["hashed_ngram_score"]


def hashed_ngram_score(
    docs: DataFrame,
    weights: list[int],
    bias: int = 0,
    col: str = "text",
) -> DataFrame:
    """Adds ``n_grams`` (token-bigram count), ``score`` (bias +
    hashed-bigram weight sum, BIGINT) and ``keep`` (score > 0, int).
    Documents with fewer than two tokens score ``bias`` alone."""
    dim = len(weights)
    if dim & (dim - 1):
        raise ValueError(f"dim must be a power of two, got {dim}")
    toks = F.split(F.trim(F.coalesce(F.col(col), F.lit(""))), "[ \\t\\r\\n]+")
    n = F.size(toks)
    grams = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(0), n - 2),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    # TRUE array literal — element_at over CreateArray re-evaluates the
    # D-element construction per access (10x at corpus scale)
    w_arr = F.lit([int(w) for w in weights]).cast("array<long>")
    score = F.aggregate(
        grams,
        F.lit(int(bias)).cast("long"),
        lambda acc, g: acc
        + F.element_at(w_arr, F.pmod(F.xxhash64(g), F.lit(dim)).cast("int") + 1),
    )
    return docs.select(
        "*",
        F.size(grams).alias("n_grams"),
        score.alias("score"),
        (score > 0).cast("int").alias("keep"),
    )
