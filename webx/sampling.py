"""Deterministic sampling & splitting for training-data pipelines.

``df.sample``/``sampleBy`` are Bernoulli draws whose outcome depends on
partitioning — unusable when a sample must be reproducible across
cluster sizes, re-runs, and engines. These operators instead derive
membership from a CONTENT hash: ``pmod(xxhash64(key, salt), 10^6)``
buckets each row deterministically, and a row is in the sample/split iff
its bucket falls under the per-stratum threshold. Properties the
Bernoulli version lacks:

* identical output on any partitioning, cluster size, or engine (the
  DuckDB oracle recomputes membership exactly via the XXH64 port);
* stable under appends — adding rows never flips existing rows' splits
  (the foundation of leakage-free train/val/test separation);
* zero shuffle: one narrow filter/projection.

The reference's per-dataset ``sample_ratio`` (det_dataset.py:106-139 /
rec_lmdb_dataset.py order-list truncation) is the ratio knob this
generalizes; the salt plays the reference's shuffle-seed role.
"""

from __future__ import annotations

from itertools import chain

from pyspark.sql import Column, DataFrame, functions as F

BUCKETS = 1_000_000


def split_cuts(weights: tuple) -> list:
    """Cumulative bucket cut points for ``split_assign`` — the single
    source of truth shared with the DuckDB oracle builder
    (__spark_entry__._sampling_oracle_sql)."""
    cuts, acc = [], 0.0
    for w in weights[:-1]:
        acc += w
        cuts.append(int(round(acc * BUCKETS)))
    return cuts


def hash_bucket(key_col, salt: int = 42) -> Column:
    """Deterministic bucket in [0, 10^6): pmod(xxhash64(key, salt), 10^6)."""
    return F.pmod(F.xxhash64(F.col(key_col), F.lit(salt)), F.lit(BUCKETS))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict,
    key_col: str = "doc_id",
    salt: int = 42,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Keep ~fraction of each stratum, deterministically by key hash.
    Strata absent from ``fractions`` fall back to ``default_fraction``."""
    thr_map = F.create_map(
        *chain.from_iterable(
            (F.lit(k), F.lit(int(round(v * BUCKETS)))) for k, v in fractions.items()
        )
    )
    thr = F.coalesce(
        thr_map[F.col(strata_col)],
        F.lit(int(round(default_fraction * BUCKETS))),
    )
    return df.filter(hash_bucket(key_col, salt) < thr)


def split_assign(
    df: DataFrame,
    weights: tuple = (0.8, 0.1, 0.1),
    names: tuple = ("train", "val", "test"),
    key_col: str = "doc_id",
    salt: int = 7,
) -> DataFrame:
    """Add a ``split`` column assigning each row to one of ``names`` with
    the given weight proportions — append-stable and engine-independent
    (hash thresholds, not random draws). Weights must sum to ~1."""
    if len(weights) != len(names) or abs(sum(weights) - 1.0) >= 1e-9:
        raise ValueError(
            f"weights {weights} must match names {names} and sum to 1"
        )
    b = hash_bucket(key_col, salt)
    cuts = split_cuts(weights)
    # build the when-chain in reverse so the LOWEST threshold wins
    expr = F.lit(names[-1])
    for i in range(len(cuts) - 1, -1, -1):
        expr = F.when(b < cuts[i], F.lit(names[i])).otherwise(expr)
    return df.withColumn("split", expr)


def temperature_sample(
    df: DataFrame,
    lang_col: str = "lang",
    target_total: int = 100,
    key_col: str = "doc_id",
    salt: int = 42,
) -> DataFrame:
    """Temperature-balanced multilingual sampling (the alpha=0.5
    language-rebalancing rule of multilingual LM training, e.g. mBERT /
    XLM-R exponentiated-smoothing: sample language l proportionally to
    p_l^alpha, up-weighting low-resource languages). Expected kept rows
    per language ~ target_total * w_l / sum(w), w_l = floor(sqrt(n_l)),
    capped at n_l; membership is the deterministic hash-bucket rule of
    this module.

    Exactness: keep iff

        bucket(key) * sum_w * n_l  <  target_total * BUCKETS * w_l

    — the threshold comparison cross-multiplied into PURE INTEGER
    arithmetic (decimal(38,0) so 100-TB-scale products cannot overflow,
    mirrored by HUGEINT in the oracle): no division, no float pow, no
    rounding boundary an engine could disagree on. floor(sqrt(n)) is
    safe because IEEE sqrt is correctly rounded in both engines (pow
    is not — which is why alpha is fixed at 0.5 here).

    Plan: one tiny per-language count aggregate + its 1-row total, both
    broadcast back onto the corpus; the filter itself is a narrow
    codegen projection — no corpus shuffle, partition-independent,
    append-stable per language."""
    d38 = "decimal(38,0)"
    counts = df.groupBy(lang_col).agg(F.count("*").alias("n_l"))
    counts = counts.withColumn(
        "w_l", F.floor(F.sqrt(F.col("n_l").cast("double"))).cast("long")
    )
    denom = counts.agg(F.sum("w_l").alias("sum_w"))  # 1 row
    rates = F.broadcast(counts.crossJoin(F.broadcast(denom)))
    lhs = (
        hash_bucket(key_col, salt).cast(d38)
        * F.col("sum_w").cast(d38)
        * F.col("n_l").cast(d38)
    )
    rhs = (
        F.lit(target_total).cast(d38)
        * F.lit(BUCKETS).cast(d38)
        * F.col("w_l").cast(d38)
    )
    return df.join(rates, lang_col).filter(lhs < rhs).select(*df.columns)


def weighted_sample_topk(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int = 50,
) -> DataFrame:
    """Weighted random sampling WITHOUT replacement, the
    Efraimidis-Spirakis A-ES scheme (2006): each row draws
    u = hash(key)/2^64 ∈ (0,1] and the sample is the top-k rows by
    key ``ln(u)/w`` (monotone-equivalent to u^(1/w); inclusion
    probability ∝ weight). The curation use: draw a quality-weighted
    corpus subsample — or a per-shard audit sample — that is
    REPRODUCIBLE across cluster sizes, re-runs, and engines, which
    ``df.sample`` (partition-seeded Bernoulli) cannot give.

    Determinism discipline: u is recovered from the signed xxhash64 in
    decimal(38,0) first so the double conversion rounds ONCE (the
    kmv_distinct precedent); ln and one divide are the only float ops,
    computed identically from identical doubles; ties break on the key
    then doc order. Plan: one narrow projection + TakeOrdered(k) —
    per-partition top-k partials, no full sort, no window over an
    unpartitioned frame; the k-row result gets ranks in a trivially
    small final window.
    """
    from pyspark.sql import Window

    ranked = df.select(
        F.col(key_col).alias("key"),
        F.col(weight_col).cast("long").alias("weight"),
        _aes_skey(key_col, weight_col).alias("skey"),
    )
    top = ranked.orderBy(F.desc("skey"), F.asc("key")).limit(k)
    w = Window.orderBy(F.desc("skey"), F.asc("key"))
    return top.withColumn("rank", F.row_number().over(w).cast("int")).select(
        "rank", "key", "weight"
    )


def _aes_skey(key_col: str, weight_col: str):
    """The Efraimidis-Spirakis sort key ln(u)/w with u hash-derived.

    Signed hash → true u64: the sign-bit flip yields (hu - 2^63) as a
    signed long for ANY hu, so the decimal +2^63 recovers hu exactly
    (the kmv_distinct reconstruction); the double cast then rounds
    ONCE, bit-identical to the oracle's HUGEINT::DOUBLE. +1 in the
    numerator keeps u > 0 (ln(0) = -inf would still order correctly
    but poisons the gated float derivation in pytest)."""
    u64 = (
        F.xxhash64(F.col(key_col))
        .bitwiseXOR(F.lit(-(1 << 63)))
        .cast("decimal(38,0)")
        + F.expr("CAST(9223372036854775808 AS DECIMAL(38,0))")
    ).cast("double")
    u = (u64 + F.lit(1.0)) / F.lit(float(1 << 64))
    return F.log(u) / F.col(weight_col).cast("double")


def weighted_sample_per_group(
    df: DataFrame,
    group_col: str,
    key_col: str,
    weight_col: str,
    k: int = 5,
) -> DataFrame:
    """Per-group A-ES weighted sampling without replacement → (group,
    rank, key, weight): the top-k rows BY GROUP under the same ln(u)/w
    key as ``weighted_sample_topk``. The curation use: a per-language
    (or per-host, per-source) quality-weighted audit sample where every
    stratum is represented — the global top-k would starve small
    groups.

    Plan: one narrow projection + ONE shuffle on the group key into a
    rank-filtered window — Spark rewrites ``rank <= k`` over a
    partitioned window into WindowGroupLimit (per-partition partial
    top-k BEFORE the exchange), so each task ships at most k rows per
    group, never the group's full membership. Same determinism
    discipline as the global variant.
    """
    from pyspark.sql import Window

    ranked = df.select(
        F.col(group_col).alias("grp"),
        F.col(key_col).alias("key"),
        F.col(weight_col).cast("long").alias("weight"),
        _aes_skey(key_col, weight_col).alias("skey"),
    )
    w = Window.partitionBy("grp").orderBy(F.desc("skey"), F.asc("key"))
    return (
        ranked.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("grp", "rank", "key", "weight")
    )


def rendezvous_assign(
    df: DataFrame,
    key_col: str,
    shard_ids,
    out_col: str = "shard",
) -> DataFrame:
    """Rendezvous (highest-random-weight) shard assignment: each row
    goes to ``argmax_s xxhash64(key, s)`` over the shard id list —
    Thaler & Ravishankar's HRW hashing, the assignment rule behind
    consistent cache/shard routing. Its defining property (pinned by
    test + the two-shard-list driver query): when a shard is ADDED,
    the only keys that move are those whose new shard wins — an
    expected 1/(n+1) of the corpus — while modulo sharding
    (``corpus_shard``) reshuffles nearly everything. Use it when shard
    count changes at runtime (cache tiers, incremental re-export);
    ``corpus_shard`` stays the right tool for one-shot balanced writes.

    Zero shuffle, zero Python: n_shards xxhash64 calls + one
    ``greatest`` over (weight, shard) structs per row, all codegen;
    ties (a 2^-64 event) break to the larger shard id via the struct
    order. Same fold the oracle's XXH64 port replays
    (xhash_int(s, xhash_long(key, 42)))."""
    pairs = [
        F.struct(
            F.xxhash64(F.col(key_col), F.lit(int(s))).alias("w"),
            F.lit(int(s)).alias("s"),
        )
        for s in shard_ids
    ]
    if len(pairs) < 2:
        return df.withColumn(out_col, F.lit(int(list(shard_ids)[0])))
    return df.withColumn(out_col, F.greatest(*pairs).getField("s"))


def corpus_shard(
    df: DataFrame,
    key_col: str,
    n_shards: int = 16,
) -> DataFrame:
    """Deterministic global corpus shuffle + sharding → (shard, pos,
    key): the training-export final step. shard = the low log2(n)
    bits of xxhash64(key) (n_shards MUST be a power of two so the
    signed low-bit mask, the unsigned modulus, and the oracle's
    HUGEINT % n all agree); pos = the row's rank within its shard in
    unsigned-hash order. Hash-ordering IS the shuffle: adjacent input
    rows (same host, same crawl segment) land in different shards at
    uncorrelated positions, every engine/cluster-size/run reproduces
    the exact same order, and a resumed export rewrites byte-identical
    shards — none of which ``orderBy(rand())`` can give.

    Plan: one narrow hash projection + ONE exchange on shard + a
    per-shard sort (the window's sort IS the writer's
    ``repartition(shard).sortWithinPartitions`` — no global sort, no
    single-partition window; shards are hash-balanced so no skew).
    """
    if n_shards & (n_shards - 1):
        raise ValueError(f"n_shards must be a power of two, got {n_shards}")
    from pyspark.sql import Window

    h = F.xxhash64(F.col(key_col))
    # low bits of the signed two's-complement long == unsigned % 2^b
    shard = h.bitwiseAND(F.lit(n_shards - 1)).cast("int")
    okey = h.bitwiseXOR(F.lit(-(1 << 63)))  # unsigned comparison order
    w = Window.partitionBy("shard").orderBy("okey", "key")
    return (
        df.select(
            F.col(key_col).alias("key"), shard.alias("shard"), okey.alias("okey")
        )
        .withColumn("pos", F.row_number().over(w).cast("int"))
        .select("shard", "pos", "key")
    )


def unimax_allocation(
    counts: DataFrame,
    budget: int,
    max_epochs: int = 4,
    lang_col: str = "lang",
    size_col: str = "size",
) -> DataFrame:
    """UniMax language sampling (Chung et al. 2023, ICLR): split a
    token budget across languages by WATER-FILLING under a per-language
    epoch cap — every language gets an equal share of the remaining
    budget unless max_epochs × its corpus size is smaller, in which
    case it gets exactly its cap and the surplus flows to the rest.
    The multilingual-pretraining allocator that replaces temperature
    sampling's one-knob compromise (τ low → head langs dominate, τ high
    → tail langs repeat for dozens of epochs).

    All-integer closed form, so the whole result carries a full value
    oracle: sort ascending by cap c = max_epochs·size; a language is
    capped iff c_i·(n-i+1) ≤ B − Σ_{j<i} c_j AND every smaller language
    is capped (the capped set is a prefix of the ascending order — the
    rowwise inequality alone misreads rows after the first uncapped
    one, hence the running AND); uncapped languages split the remaining
    budget by floor + largest-remainder top-up (shares are equal, so
    the top-up tie-breaks by size desc then lang asc), making
    Σ alloc = budget exact by construction.

    Plan: one aggregate to per-lang counts upstream of this function;
    here only windows over the ≤few-hundred-language frame — zero
    corpus shuffles. Returns (lang, size, cap, capped, alloc).
    """
    from pyspark.sql import Window

    n = F.count("*").over(Window.partitionBy())
    asc = Window.orderBy(F.asc("cap"), F.asc("lang"))
    base = counts.select(
        F.col(lang_col).alias("lang"),
        F.col(size_col).cast("long").alias("size"),
        (F.lit(max_epochs) * F.col(size_col)).cast("long").alias("cap"),
    )
    ranked = base.select(
        "*",
        F.row_number().over(asc).alias("i"),
        (F.sum("cap").over(asc) - F.col("cap")).alias("precum"),
        n.alias("n"),
    )
    flag = (F.col("cap") * (F.col("n") - F.col("i") + 1)) <= (
        F.lit(budget) - F.col("precum")
    )
    flagged = ranked.withColumn("flag", flag.cast("int")).withColumn(
        "capped", (F.min("flag").over(asc) == 1)
    )
    # scalars of the tiny frame: K capped langs consuming capsum
    agg = Window.partitionBy()
    flagged = flagged.withColumn(
        "capsum",
        F.coalesce(F.sum(F.when(F.col("capped"), F.col("cap"))).over(agg), F.lit(0)),
    ).withColumn("m", F.sum(F.when(~F.col("capped"), 1).otherwise(0)).over(agg))
    flagged = flagged.withColumn("rem", F.lit(budget) - F.col("capsum"))
    # integer `div`, not float `/` (long/long is DOUBLE in Spark — a
    # 2^53 hazard at real token budgets); greatest(m,1): when every
    # language is capped the otherwise-branch is dead but ANSI mode
    # would still raise on the 0 divisor
    share = F.expr("rem div greatest(m, CAST(1 AS BIGINT))")
    extras = F.col("rem") - share * F.col("m")  # == rem % m, m > 0
    topup_rank = F.row_number().over(
        Window.partitionBy("capped").orderBy(F.desc("size"), F.asc("lang"))
    )
    alloc = F.when(F.col("capped"), F.col("cap")).otherwise(
        share + F.when(F.col("tr") <= extras, 1).otherwise(0)
    )
    return (
        flagged.withColumn("tr", topup_rank)
        .select(
            "lang",
            "size",
            "cap",
            "capped",
            alloc.cast("long").alias("alloc"),
        )
    )
