"""Deduplication operators for training-data pipelines.

All signature computation is built-in JVM expressions (xxhash64 /
higher-order array functions) — no Python UDFs; the only shuffles are the
ones the algorithms require (groupBy key / band, self-join on band).

Scale notes:
* exact dedup = one hash-aggregate shuffle on the fingerprint.
* MinHash LSH = narrow signature computation, then explode to (band,
  band_hash) — the self-join is on band buckets, so cost is bounded by
  bucket sizes, not corpus²; skewed buckets (boilerplate-identical docs)
  are exactly the near-dups we want.
* verification joins shingle arrays only for candidate pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from webx.textstats import WS_SPLIT


def exact_dedup(docs: DataFrame, key: str = "text") -> DataFrame:
    """Group identical texts: (fp, n_dups, min_doc_id)."""
    fp = F.md5(F.encode(F.col(key), "UTF-8")).alias("fp")
    return (
        docs.select(fp, "doc_id")
        .groupBy("fp")
        .agg(F.count("*").alias("n_dups"), F.min("doc_id").alias("min_doc_id"))
    )


def _shingles(col="text", k: int = 3):
    """Word k-gram shingles as strings (deterministic, JVM-side)."""
    toks = F.split(F.trim(F.col(col)), WS_SPLIT)
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    return F.when(n >= k, F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)))
    )).otherwise(F.array(F.concat_ws(" ", toks)))


def minhash_signatures(docs: DataFrame, n_hashes: int = 64, shingle_k: int = 3) -> DataFrame:
    """(doc_id, sig: array<bigint>) — sig[h] = min over shingles of
    xxhash64(shingle, h). One narrow projection, no shuffle."""
    sh = _shingles(k=shingle_k)
    seeds = F.sequence(F.lit(0), F.lit(n_hashes - 1))
    sig = F.transform(
        seeds, lambda h: F.array_min(F.transform(sh, lambda s: F.xxhash64(s, h)))
    )
    return docs.select("doc_id", sig.alias("sig"))


def lsh_candidate_pairs(
    sigs: DataFrame, bands: int = 16, rows_per_band: int = 4
) -> DataFrame:
    """Banded LSH: docs sharing any band hash → candidate pairs (a < b)."""
    band_idx = F.sequence(F.lit(0), F.lit(bands - 1))
    banded = sigs.select(
        "doc_id",
        F.explode(
            F.transform(
                band_idx,
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(F.slice("sig", b * rows_per_band + 1, rows_per_band), b).alias("bh"),
                ),
            )
        ).alias("e"),
    ).select("doc_id", "e.band", "e.bh")
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .distinct()
    )


def jaccard_verify(
    docs: DataFrame, pairs: DataFrame, shingle_k: int = 3, threshold: float = 0.7
) -> DataFrame:
    """Exact n-gram Jaccard for candidate pairs → (id_a, id_b, jaccard),
    filtered to >= threshold. Joins only the candidate set."""
    sh = docs.select("doc_id", _shingles(k=shingle_k).alias("sh"))
    j = (
        pairs.join(sh.withColumnRenamed("doc_id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed("doc_id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b"))
            ).alias("jaccard"),
        )
    )
    return j.filter(F.col("jaccard") >= threshold)


def minhash_neardup(
    docs: DataFrame,
    n_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    threshold: float = 0.7,
) -> DataFrame:
    """Full MinHash→LSH→verify pipeline → (id_a, id_b, jaccard)."""
    rows_per_band = n_hashes // bands
    sigs = minhash_signatures(docs, n_hashes, shingle_k)
    pairs = lsh_candidate_pairs(sigs, bands, rows_per_band)
    return jaccard_verify(docs, pairs, shingle_k, threshold)


def simhash(docs: DataFrame, col: str = "text") -> DataFrame:
    """64-bit SimHash over whitespace tokens → (doc_id, simhash: bigint).

    bit i set ⇔ sum over tokens of ±1 (sign of token-hash bit i) > 0.
    Pure higher-order JVM expressions."""
    toks = F.split(F.trim(F.col(col)), WS_SPLIT)
    hashed = docs.select(
        "doc_id", F.transform(toks, lambda t: F.xxhash64(t)).alias("th")
    )
    # shift-by-column needs the SQL expression form
    val = F.expr(
        "aggregate("
        "  transform(sequence(0, 63), i -> struct(i AS i,"
        "    aggregate(th, 0, (acc, h) -> acc +"
        "      if((shiftright(h, i) & 1) = 1, 1, -1)) AS s)),"
        "  cast(0 AS bigint),"
        "  (acc, e) -> acc + if(e.s > 0, shiftleft(cast(1 AS bigint), e.i),"
        "                       cast(0 AS bigint)))"
    )
    return hashed.select("doc_id", val.alias("simhash"))


def simhash_neardup(docs: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Band 64-bit simhash into 4×16-bit chunks (pigeonhole: hamming ≤ 3 ⇒
    some chunk equal) → candidates → exact hamming filter."""
    sh = simhash(docs)
    chunks = sh.select(
        "doc_id",
        "simhash",
        F.explode(
            F.expr(
                "transform(sequence(0, 3), c -> struct(c AS chunk,"
                "  (shiftright(simhash, c * 16) & 65535) AS cv))"
            )
        ).alias("e"),
    ).select("doc_id", "simhash", "e.chunk", "e.cv")
    a, b = chunks.alias("a"), chunks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.cv") == F.col("b.cv"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return cand.select("id_a", "id_b", ham.alias("hamming")).filter(
        F.col("hamming") <= max_hamming
    )
