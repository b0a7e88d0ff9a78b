"""Distributed BPE tokenizer training and encoding (the byte-pair
encoding algorithm of Sennrich, Haddow & Birch 2016, "Neural Machine
Translation of Rare Words with Subword Units") — the tokenizer-training
companion to the corpus operators: at 100 TB the tokenizer is trained ON
the extracted corpus, so the engine must produce merge tables and
encodings, not just token counts.

Scale shape (the part that matters at crawl scale):

* ONE corpus pass builds the word-frequency table (``word_counts``) —
  after the map-side partial aggregate everything downstream is
  *vocabulary*-scale (10^7-10^8 rows for a web corpus), never
  corpus-scale.
* Every merge iteration touches only the vocabulary table: one
  pair-count aggregation plus a fold that applies the winning merge to
  each word's symbol list (pure codegen ``F.aggregate`` — greedy
  left-to-right, the reference algorithm's semantics). ``localCheckpoint``
  every few iterations caps lineage growth, the ``graph.pagerank_hosts``
  pattern.
* The per-iteration driver fetch is ONE row (the argmax pair) — the
  same sanctioned driver traffic as KMeans centroids.
* ``bpe_encode`` never replays merges over the corpus: the trained
  vocabulary table already maps word -> final symbols, so encoding is a
  pretokenize + word-table join + ordered reassembly. Only
  out-of-vocabulary words (a vocabulary-scale DISTINCT, not corpus) take
  the Python merge-replay path, Arrow-batched.

Pretokenization reuses ``textstats.BPE_SPLIT`` (the GPT-2-style,
ASCII-restricted regex shared byte-for-byte with the DuckDB oracle).
Case is preserved, as in the reference algorithm.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from webx.textstats import BPE_SPLIT

END = "</w>"  # end-of-word marker symbol (Sennrich's </w>)


def _pretokens(col: str = "text") -> Column:
    return F.regexp_extract_all(col, F.lit(BPE_SPLIT), 0)


def word_counts(docs: DataFrame, col: str = "text") -> DataFrame:
    """(word, cnt) — the one corpus-scale pass."""
    return (
        docs.select(F.explode(_pretokens(col)).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


def _initial_syms(word_col: Column) -> Column:
    """Characters of the word plus the terminal ``</w>`` symbol."""
    chars = F.filter(F.split(word_col, ""), lambda c: c != F.lit(""))
    return F.concat(chars, F.array(F.lit(END)))


def initial_vocab(docs: DataFrame, col: str = "text") -> DataFrame:
    """(word, cnt, syms) — word-frequency table with each word split
    into its starting symbol sequence."""
    return word_counts(docs, col).withColumn("syms", _initial_syms(F.col("word")))


def pair_counts(vocab: DataFrame) -> DataFrame:
    """(p1, p2, cnt) — adjacent-symbol pair frequencies over the
    vocabulary, weighted by word count. Vocabulary-scale explode."""
    syms = F.col("syms")
    n = F.size(syms)
    pairs_arr = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.struct(
                F.element_at(syms, i).alias("p1"),
                F.element_at(syms, i + F.lit(1)).alias("p2"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<p1:string,p2:string>>"))
    return (
        vocab.select(F.col("cnt"), F.explode(pairs_arr).alias("p"))
        .groupBy("p.p1", "p.p2")
        .agg(F.sum("cnt").alias("cnt"))
    )


def _merge_pair(syms: Column, p1: str, p2: str) -> Column:
    """Apply one merge greedily left-to-right: fold over the symbol list,
    replacing each non-overlapping adjacent (p1, p2) with p1||p2 — on
    'a a a' with merge (a,a) this yields ['aa','a'], the reference
    algorithm's behavior. Pure codegen (no Python in the vocab pass)."""
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.try_element_at(acc, F.lit(-1)) == F.lit(p1)) & (x == F.lit(p2)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(p1 + p2))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def learn_bpe(
    docs: DataFrame,
    n_merges: int,
    col: str = "text",
    checkpoint_every: int = 4,
):
    """Train ``n_merges`` BPE merges on the corpus. Returns
    ``(merges, vocab)``: ``merges`` is a list of (rank, p1, p2, cnt)
    tuples in learned order (rank 1-based; ties broken by count desc,
    then p1, p2 ascending — deterministic across partitionings and
    engines), ``vocab`` the final (word, cnt, syms) DataFrame whose
    ``syms`` are the trained encodings of every training word."""
    vocab = initial_vocab(docs, col).localCheckpoint()
    merges: list = []
    for r in range(1, n_merges + 1):
        top = (
            pair_counts(vocab)
            .orderBy(F.desc("cnt"), F.asc("p1"), F.asc("p2"))
            .first()
        )
        if top is None:  # corpus exhausted (every word is one symbol)
            break
        merges.append((r, top["p1"], top["p2"], top["cnt"]))
        vocab = vocab.withColumn(
            "syms", _merge_pair(F.col("syms"), top["p1"], top["p2"])
        )
        if r % checkpoint_every == 0:
            vocab = vocab.localCheckpoint()
    return merges, vocab


def _encode_word_py(word: str, merges: list) -> list:
    """Python merge replay for a single word — the OOV path. Mirrors
    ``_merge_pair`` exactly (greedy left-to-right per merge, merges in
    learned order)."""
    syms = list(word) + [END]
    for _, p1, p2, _ in merges:
        out: list = []
        for s in syms:
            if out and out[-1] == p1 and s == p2:
                out[-1] = p1 + p2
            else:
                out.append(s)
        syms = out
    return syms


def bpe_encode(
    docs: DataFrame,
    merges: list,
    vocab: DataFrame | None = None,
    col: str = "text",
) -> DataFrame:
    """Encode each document with a trained merge list → (doc_id,
    n_pieces, pieces) with ``pieces`` the space-joined symbol stream in
    document order (symbols never contain spaces: the pretokenizer
    strips whitespace and merges only concatenate).

    If ``vocab`` (from ``learn_bpe``) is given, in-vocabulary words take
    the join path with zero Python; words outside it are encoded by
    replaying the merges over the DISTINCT OOV word table (vocabulary-
    scale, Arrow-batched), never per corpus occurrence."""
    import pandas as pd

    spark = docs.sparkSession
    words = docs.select(
        F.col("doc_id"), F.posexplode(_pretokens(col)).alias("pos", "word")
    )
    distinct_words = words.select("word").distinct()
    if vocab is not None:
        known = vocab.select("word", "syms")
        oov = distinct_words.join(known, "word", "left_anti")
    else:
        known = None
        oov = distinct_words

    b_merges = spark.sparkContext.broadcast(merges)

    def encode_batches(batches):
        ms = b_merges.value
        for p in batches:
            yield pd.DataFrame(
                {
                    "word": p["word"],
                    "syms": [_encode_word_py(w, ms) for w in p["word"]],
                }
            )

    oov_enc = oov.mapInPandas(
        encode_batches, "word string, syms array<string>"
    )
    word_map = oov_enc if known is None else known.unionByName(oov_enc)

    encoded = (
        words.join(word_map, "word")
        .groupBy("doc_id")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("pos"), F.col("syms")))
                    ),
                    lambda s: s["syms"],
                )
            ).alias("sym_stream")
        )
        .select(
            "doc_id",
            F.size("sym_stream").alias("n_pieces"),
            F.array_join("sym_stream", " ").alias("pieces"),
        )
    )
    # documents with zero pretokens (empty/whitespace text) still get a row
    return (
        docs.select("doc_id")
        .join(encoded, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_pieces", F.lit(0)).alias("n_pieces"),
            F.coalesce("pieces", F.lit("")).alias("pieces"),
        )
    )
