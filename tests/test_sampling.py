"""Deterministic sampling/splitting (webx/sampling.py): the properties
Bernoulli sample()/sampleBy() cannot give — partition independence,
append stability, engine independence (oracle-checked in the driver
gate), plus approximate fraction correctness."""

from __future__ import annotations

from pyspark.sql import functions as F

from webx.sampling import hash_bucket, split_assign, stratified_sample


def _docs(spark, n=2000):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "en")
        .when(F.col("id") % 3 == 1, "de")
        .otherwise("fr")
        .alias("lang"),
    )


def test_partition_independence(spark):
    docs = _docs(spark)
    a = set(
        r["doc_id"]
        for r in stratified_sample(docs.repartition(1), "lang", {"en": 0.5, "de": 0.2, "fr": 0.9}).collect()
    )
    b = set(
        r["doc_id"]
        for r in stratified_sample(docs.repartition(17, "lang"), "lang", {"en": 0.5, "de": 0.2, "fr": 0.9}).collect()
    )
    assert a == b and len(a) > 0


def test_append_stability(spark):
    """Adding rows never flips existing rows' split assignment."""
    small = split_assign(_docs(spark, 500))
    big = split_assign(_docs(spark, 2000))
    sm = {r["doc_id"]: r["split"] for r in small.collect()}
    bg = {r["doc_id"]: r["split"] for r in big.collect()}
    assert all(bg[k] == v for k, v in sm.items())


def test_fractions_approximately_met(spark):
    docs = _docs(spark, 3000)
    out = stratified_sample(docs, "lang", {"en": 0.5, "de": 0.2}, default_fraction=0.0)
    counts = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    n_per = 1000  # per stratum
    assert abs(counts.get("en", 0) / n_per - 0.5) < 0.08
    assert abs(counts.get("de", 0) / n_per - 0.2) < 0.08
    assert "fr" not in counts  # default fraction 0 drops unlisted strata


def test_split_covers_all_rows_disjointly(spark):
    out = split_assign(_docs(spark, 1000))
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 1000
    assert abs(counts["train"] / 1000 - 0.8) < 0.06
    assert set(counts) == {"train", "val", "test"}


def test_bucket_range(spark):
    row = (
        _docs(spark, 500)
        .select(hash_bucket("doc_id").alias("b"))
        .agg(F.min("b").alias("lo"), F.max("b").alias("hi"))
        .first()
    )
    assert 0 <= row["lo"] and row["hi"] < 1_000_000


def test_weighted_sample_partition_independence_and_rank(spark):
    from webx.sampling import weighted_sample_topk

    docs = spark.range(2000).select(
        F.col("id").alias("doc_id"), (1 + F.col("id") % 10).alias("w")
    )
    a = [tuple(r) for r in weighted_sample_topk(docs.coalesce(1), "doc_id", "w", k=40).collect()]
    b = [tuple(r) for r in weighted_sample_topk(docs.repartition(16), "doc_id", "w", k=40).collect()]
    assert a == b
    assert [r[0] for r in a] == list(range(1, 41))  # dense ranks 1..k


def test_weighted_sample_key_matches_python_derivation(spark):
    """The ln(u)/w sort key re-derived row-by-row in Python from the
    shared XXH64 must reproduce the exact Spark sample membership and
    order (the single-rounding decimal discipline)."""
    import math

    from webx import xxh64 as X
    from webx.sampling import weighted_sample_topk

    n, k = 500, 25
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"), (1 + F.col("id") % 7).alias("w")
    )
    got = [(r["rank"], r["key"], r["weight"]) for r in
           weighted_sample_topk(docs, "doc_id", "w", k=k).collect()]
    keyed = []
    for i in range(n):
        w = 1 + i % 7
        u = (float(X.to_unsigned(X.hash_long(i))) + 1.0) / 2.0**64
        keyed.append((math.log(u) / w, -i, i, w))
    keyed.sort(reverse=True)
    want = [(r + 1, doc, w) for r, (_, _, doc, w) in enumerate(keyed[:k])]
    assert got == want


def test_weighted_sample_inclusion_tracks_weight(spark):
    """Statistical sanity: with weights 1 vs 10 in equal numbers, the
    heavy class should dominate the sample (A-ES inclusion ∝ weight)."""
    docs = spark.range(4000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, 10).otherwise(1).alias("w"),
    )
    from webx.sampling import weighted_sample_topk

    top = weighted_sample_topk(docs, "doc_id", "w", k=200)
    heavy = top.filter(F.col("weight") == 10).count()
    assert heavy > 150  # E[heavy] ≈ 182 of 200; 150 is ~5 sigma slack


def test_group_sample_every_stratum_represented(spark):
    from webx.sampling import weighted_sample_per_group

    docs = _docs(spark, 3000).select(
        "lang", "doc_id", (1 + F.col("doc_id") % 10).alias("w")
    )
    out = weighted_sample_per_group(docs, "lang", "doc_id", "w", k=5).collect()
    by_grp: dict = {}
    for r in out:
        by_grp.setdefault(r["grp"], []).append(r["rank"])
    assert set(by_grp) == {"en", "de", "fr"}
    for g, ranks in by_grp.items():
        assert sorted(ranks) == [1, 2, 3, 4, 5], g
    # partition independence
    a = sorted(map(tuple, out))
    b = sorted(
        map(
            tuple,
            weighted_sample_per_group(
                docs.repartition(16), "lang", "doc_id", "w", k=5
            ).collect(),
        )
    )
    assert a == b


def test_group_sample_uses_window_group_limit(spark):
    """rank<=k over a partitioned window must compile to the partial
    top-k pushdown (WindowGroupLimit), not a full per-group sort of all
    members shipped through the exchange."""
    from webx.sampling import weighted_sample_per_group

    docs = _docs(spark, 100).select(
        "lang", "doc_id", (1 + F.col("doc_id") % 10).alias("w")
    )
    plan = weighted_sample_per_group(docs, "lang", "doc_id", "w", k=5)._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, plan


def test_corpus_shard_balance_and_replay(spark):
    import math

    from webx import xxh64 as X
    from webx.sampling import corpus_shard

    n = 2000
    docs = spark.range(n).select(F.col("id").alias("doc_id"))
    got = [(r["shard"], r["pos"], r["key"]) for r in corpus_shard(docs, "doc_id").collect()]
    # python replay: shard = low 4 bits, pos = unsigned-hash order in shard
    rows = []
    for i in range(n):
        hu = X.to_unsigned(X.hash_long(i))
        rows.append((hu & 15, hu, i))
    want = []
    for s in range(16):
        members = sorted((hu, key) for sh, hu, key in rows if sh == s)
        want.extend((s, p + 1, key) for p, (_, key) in enumerate(members))
    assert sorted(got) == sorted(want)
    # hash balance: no shard more than ~2x the mean at n=2000
    sizes = [sum(1 for s, _, _ in got if s == sh) for sh in range(16)]
    assert max(sizes) < 2 * (n / 16) and min(sizes) > 0.4 * (n / 16)
    # partition independence
    again = [
        (r["shard"], r["pos"], r["key"])
        for r in corpus_shard(docs.repartition(13), "doc_id").collect()
    ]
    assert sorted(again) == sorted(got)
    # non-power-of-two rejected
    try:
        corpus_shard(docs, "doc_id", n_shards=10)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def _unimax_py(sizes: dict, budget: int, e: int):
    """Independent waterfill reference: iterate ascending by cap,
    capping while cap <= remaining / remaining_langs."""
    order = sorted(sizes, key=lambda l: (e * sizes[l], l))
    rem, m = budget, len(order)
    alloc = {}
    uncapped = []
    for lang in order:
        cap = e * sizes[lang]
        if cap * m <= rem:
            alloc[lang] = cap
            rem -= cap
            m -= 1
        else:
            uncapped.append(lang)
    if uncapped:
        base, extra = divmod(rem, len(uncapped))
        for r, lang in enumerate(
            sorted(uncapped, key=lambda l: (-sizes[l], l)), start=1
        ):
            alloc[lang] = base + (1 if r <= extra else 0)
    return alloc


def test_unimax_matches_reference_and_sums_to_budget(spark):
    from webx.sampling import unimax_allocation

    sizes = {"en": 5000, "de": 800, "fr": 300, "sw": 20, "yo": 3, "mi": 3}
    counts = spark.createDataFrame(list(sizes.items()), ["lang", "size"])
    for budget in (100, 2000, 9000, 50000):
        got = {
            r["lang"]: (r["alloc"], r["capped"])
            for r in unimax_allocation(counts, budget, max_epochs=4).collect()
        }
        want = _unimax_py(sizes, budget, 4)
        assert {l: a for l, (a, _) in got.items()} == want, budget
        ceiling = 4 * sum(sizes.values())
        assert sum(a for a, _ in got.values()) == min(budget, ceiling), budget
        # capped langs get exactly 4 epochs; uncapped stay under cap
        for l, (a, capped) in got.items():
            if capped:
                assert a == 4 * sizes[l]
            else:
                assert a <= 4 * sizes[l]


def test_unimax_all_capped_when_budget_exceeds_epoch_ceiling(spark):
    from webx.sampling import unimax_allocation

    sizes = {"a": 10, "b": 20}
    counts = spark.createDataFrame(list(sizes.items()), ["lang", "size"])
    got = {r["lang"]: r["alloc"] for r in
           unimax_allocation(counts, budget=1000, max_epochs=2).collect()}
    # ceiling = 2*(10+20) = 60 < 1000: everyone capped, surplus unassigned
    assert got == {"a": 20, "b": 40}


def test_capture_recapture_estimator(spark):
    """Lincoln-Petersen over two independent 10% hash samples: the
    estimate should land near the true count on a 20k corpus (m ~ 200,
    relative s.e. ~ 1/sqrt(m) ~ 7%)."""
    from pyspark.sql import functions as F
    from webx.sampling import hash_bucket

    docs = spark.range(20_000).select(F.col("id").alias("doc_id"))
    in1 = (hash_bucket("doc_id", salt=1) < 100_000).cast("long")
    in2 = (hash_bucket("doc_id", salt=2) < 100_000).cast("long")
    r = docs.agg(
        F.sum(in1).alias("n1"),
        F.sum(in2).alias("n2"),
        F.sum(in1 * in2).alias("m"),
        F.count("*").alias("true_n"),
    ).collect()[0]
    assert r.m > 0
    n_hat = (r.n1 * r.n2) // r.m
    assert abs(n_hat - r.true_n) / r.true_n < 0.25
