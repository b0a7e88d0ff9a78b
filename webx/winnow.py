"""Winnowing document fingerprints — Schleimer, Wilkerson & Aiken 2003
("Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD; the
MOSS algorithm). MinHash answers "how similar are these documents
overall"; winnowing answers "do these documents SHARE A PASSAGE" — the
guarantee is positional: any shared substring of length ≥ w+k-1
contributes at least one identical selected fingerprint to both
documents. The curation uses: quote/boilerplate passage mining,
license-text detection, and plagiarism-style local-overlap audits that
whole-document sketches cannot express.

Algorithm: normalize (lower, strip non-alphanumerics — MOSS's
whitespace/punctuation insensitivity), hash every k-gram, slide a
w-gram window, select each window's minimum hash (rightmost on ties),
dedupe selections. Selection compares hashes in UNSIGNED order — Spark
flips the sign bit for ordering while emitting the raw signed hash, and
the DuckDB oracle orders by the HUGEINT and emits xsigned(h), so the
gated values agree exactly.

Plan shape: the gram expansion is the shingle explode every n-gram
operator here pays (narrow, no shuffle); window membership expands each
gram ≤ w times; ONE groupBy (doc, window-start) picks minima
map-side-combinable; the final distinct collapses adjacent windows that
chose the same gram. prefix_chars caps per-doc work exactly like
char_entropy's prefix (a 100 MB page cannot 100 MB-explode).

Reference analogy: mindocr's sliding-window recognition crops
(det_resize + crop fan-out) walk fixed-width windows over a line image
and keep per-window argmax scores; winnowing walks fixed-width windows
over the gram stream and keeps per-window min hashes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

K_GRAM = 8
WINDOW = 4
PREFIX_CHARS = 256


def _normed(text_col: str, prefix_chars: int):
    return F.substring(
        F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9]", ""),
        1,
        prefix_chars,
    )


def winnow_fingerprints(
    docs: DataFrame,
    k: int = K_GRAM,
    w: int = WINDOW,
    prefix_chars: int = PREFIX_CHARS,
    text_col: str = "text",
) -> DataFrame:
    """→ (doc_id, pos, h): the selected fingerprints. ``pos`` is the
    1-based gram position in the normalized prefix; ``h`` the signed
    xxhash64 of the k-gram. Documents shorter than w+k-1 normalized
    chars (no complete window) emit nothing."""
    base = docs.select("doc_id", _normed(text_col, prefix_chars).alias("s")).filter(
        F.length("s") >= w + k - 1
    )
    grams = base.select(
        "doc_id",
        F.col("s"),
        (F.length("s") - F.lit(k - 1)).alias("n_grams"),
        F.explode(F.sequence(F.lit(1), F.length("s") - F.lit(k - 1))).alias("pos"),
    ).select(
        "doc_id",
        "n_grams",
        "pos",
        F.expr(f"xxhash64(substring(s, pos, {k}))").alias("h"),
    )
    # window membership: gram at pos belongs to windows starting at
    # pos-w+1 .. pos, clipped to valid starts [1, n_grams-w+1]
    member = grams.select(
        "doc_id",
        "pos",
        "h",
        F.explode(
            F.sequence(
                F.greatest(F.col("pos") - F.lit(w - 1), F.lit(1)),
                F.least(F.col("pos"), F.col("n_grams") - F.lit(w - 1)),
            )
        ).alias("win"),
    )
    # per-window minimum in UNSIGNED hash order, rightmost pos on ties:
    # min of struct(flipped_h, -pos) — one map-side-combinable aggregate
    okey = F.col("h").bitwiseXOR(F.lit(-(1 << 63)))
    sel = (
        member.groupBy("doc_id", "win")
        .agg(F.min(F.struct(okey.alias("ok"), (-F.col("pos")).alias("np"),
                            F.col("h").alias("h"))).alias("m"))
        .select("doc_id", (-F.col("m.np")).alias("pos"), F.col("m.h").alias("h"))
        .distinct()
    )
    return sel


def winnow_matches(
    docs: DataFrame,
    min_shared: int = 2,
    k: int = K_GRAM,
    w: int = WINDOW,
    prefix_chars: int = PREFIX_CHARS,
    max_hash_docs: int | None = 100,
) -> DataFrame:
    """MOSS-style local-overlap pairs → (id_a, id_b, n_shared): document
    pairs sharing ≥ min_shared selected fingerprints (same hash — the
    shared-passage witness; any common run of w+k-1 normalized chars
    guarantees one). Self-join on the hash with id_a < id_b.

    ``max_hash_docs`` is the mega-bucket discipline (webx/dedup.py's
    LSH cap applied to fingerprints): a hash held by d documents
    expands to d·(d-1)/2 pairs, so ONE boilerplate passage shared by
    10^9 docs would emit 10^18 pairs — fingerprints in more than
    ``max_hash_docs`` docs are dropped BEFORE the pair join (they
    witness boilerplate, not plagiarism-style reuse; one distinct-count
    aggregate over the tiny fingerprint frame). None disables.

    The deduped fingerprint frame feeds THREE consumers (the cap
    aggregate and both sides of the self-join); its lineage holds the
    whole gram explosion + window-membership expansion, so it is
    materialized once via ``localCheckpoint`` (the minhash_neardup
    candidate-frame discipline, webx/dedup.py:437) instead of being
    recomputed per consumer."""
    fp = winnow_fingerprints(docs, k=k, w=w, prefix_chars=prefix_chars)
    fp = fp.select("doc_id", "h").distinct().localCheckpoint(eager=False)
    if max_hash_docs is not None:
        keep = (
            fp.groupBy("h")
            .agg(F.count("*").alias("nd"))
            .filter(F.col("nd") <= max_hash_docs)
            .select("h")
        )
        fp = fp.join(keep, "h", "leftsemi")
    a = fp.select(F.col("doc_id").alias("id_a"), "h")
    b = fp.select(F.col("doc_id").alias("id_b"), "h")
    pairs = (
        a.join(b, "h")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
    return pairs
