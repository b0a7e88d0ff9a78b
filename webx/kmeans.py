"""Distributed Lloyd's KMeans with a bit-exact cross-engine contract.

Plain float KMeans is not oracle-checkable: the update step averages
floats, and float sums depend on aggregation order, so two engines (or
two partitionings of the same engine!) legitimately disagree in the
last ulp — enough to flip an argmin and cascade. This implementation
makes every step a deterministic function of the value SET:

* coordinates quantize once to integers: ``floor(double(x) * scale)``
  — float→double is exact, multiplying by a power-of-two scale is
  exact, floor is exact;
* the update step sums INTEGERS per cluster (order-independent) and
  derives each centroid coordinate as one correctly-rounded IEEE
  division sum/count;
* the assignment step computes squared L2 in double with a PINNED
  left-associative fold (the webx/similarity.py ``_l2_fold`` contract)
  and breaks distance ties toward the lowest cluster id.

Result: the (vec_id → cluster) assignment after any number of
iterations is identical on any partitioning, cluster size, or engine,
and the DuckDB oracle replays all iterations as unrolled CTEs
(webx/oracles.py precedent: the BPE-learn oracle).

Scale shape: per iteration, ONE broadcast join (k centroid rows)
+ argmin window on vec_id + one integer aggregation whose output is
k×dim rows. The k×dim sums collect to the driver (a few KB — this is
the PageRank-style sanctioned driver loop over relational iterations);
the corpus never does. Initialization is the quantized coordinates of
the k lowest vec_ids — deterministic; swap in kmeans|| offline for
production quality, the iteration contract is unchanged.

Reference analog: mindocr has no clustering, but its deterministic
eval contract (tests/ut goldens) is the same idea — this generalizes
it to an iterative algorithm.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F


def _quantize(emb: DataFrame, scale: int) -> DataFrame:
    return emb.select(
        "vec_id",
        F.transform(
            "embedding", lambda x: F.floor(x.cast("double") * scale).cast("long")
        ).alias("q"),
    )


def _assign(q: DataFrame, cents: list, spark: SparkSession) -> DataFrame:
    """(vec_id, cid): nearest centroid by pinned-fold squared L2 in
    double, ties to the lowest cid."""
    cf = F.broadcast(
        spark.createDataFrame(
            [(cid, c) for cid, c in enumerate(cents)], "cid int, c array<double>"
        )
    )
    dist = F.aggregate(
        F.zip_with(
            "q",
            "c",
            lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    w = Window.partitionBy("vec_id").orderBy("d", "cid")
    return (
        q.crossJoin(cf)
        .select("vec_id", "cid", "q", dist.alias("d"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "cid", "q")
    )


def kmeans_lloyd(
    emb: DataFrame,
    k: int = 8,
    iters: int = 3,
    scale: int = 1024,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """→ (vec_id, cid) after ``iters`` Lloyd iterations from the
    deterministic init. An empty cluster keeps its previous centroid
    (the standard keep-stale policy, applied identically by the
    oracle).

    Centroid state is carried as exact RATIONALS (integer sum, count)
    per coordinate — the double each engine compares against is always
    one correctly-rounded division away, and the state is losslessly
    JSON-serializable: with ``checkpoint_dir`` set, each completed
    update writes ``iter_<t>.json`` (atomic rename) and a restarted
    call resumes after the last completed iteration with bit-identical
    results to an uninterrupted run — the per-partition resume story
    (webx/lineage.py) extended to iterative algorithm state."""
    import json
    import os

    spark = emb.sparkSession
    q = _quantize(emb, scale).persist()
    try:
        dim = len(q.select("q").first()["q"])

        def ck_path(t: int) -> str:
            return os.path.join(checkpoint_dir, f"iter_{t}.json")

        start = 0
        rats: list | None = None
        if checkpoint_dir:
            os.makedirs(checkpoint_dir, exist_ok=True)
            for t in range(iters - 1, -1, -1):
                if os.path.exists(ck_path(t)):
                    with open(ck_path(t)) as fh:
                        rats = json.load(fh)["cents"]
                    start = t + 1
                    break
        if rats is None:
            init_rows = (
                q.filter(F.col("vec_id") < k).orderBy("vec_id").collect()
            )
            if len(init_rows) < k:
                raise ValueError(f"need vec_id 0..{k-1} present for init")
            rats = [[[int(v), 1] for v in r["q"]] for r in init_rows]

        def doubles(r):
            return [[s / n for s, n in c] for c in r]

        assigned = None
        for t in range(start, iters):
            assigned = _assign(q, doubles(rats), spark)
            sums = (
                assigned.select("cid", F.posexplode("q").alias("pos", "v"))
                .groupBy("cid", "pos")
                .agg(F.sum("v").alias("s"), F.count("*").alias("n"))
                .collect()
            )
            by_cid: dict = {}
            for r in sums:
                by_cid.setdefault(r["cid"], [None] * dim)[r["pos"]] = [
                    int(r["s"]),
                    int(r["n"]),
                ]
            rats = [
                by_cid.get(cid, rats[cid])  # empty cluster keeps its centroid
                for cid in range(k)
            ]
            if checkpoint_dir:
                tmp = ck_path(t) + ".tmp"
                with open(tmp, "w") as fh:
                    json.dump({"t": t, "cents": rats}, fh)
                os.replace(tmp, ck_path(t))
        if assigned is None:
            # resumed past the final update: the run's assignment used the
            # state BEFORE the last update — iter_{iters-2}'s checkpoint
            # (or the deterministic init when iters == 1)
            prev_path = ck_path(iters - 2)
            if iters >= 2 and os.path.exists(prev_path):
                with open(prev_path) as fh:
                    assigned = _assign(q, doubles(json.load(fh)["cents"]), spark)
            else:
                init_rows = (
                    q.filter(F.col("vec_id") < k).orderBy("vec_id").collect()
                )
                init = [[[int(v), 1] for v in r["q"]] for r in init_rows]
                assigned = _assign(q, doubles(init), spark)
        return assigned.select("vec_id", "cid")
    finally:
        q.unpersist()


def kmeans_oracle_sql(
    k: int = 8, iters: int = 3, scale: int = 1024, dim: int = 64
) -> str:
    """DuckDB replay of :func:`kmeans_lloyd` on the ``embeddings``
    view: quantize → (assign → integer-sum update) × iters, unrolled as
    CTEs; centroid coordinate = CAST(s AS DOUBLE)/n, distance = the
    same left-associative 64-term chain, ties to lowest cid."""

    def dist_expr(carr: str, n: str) -> str:
        terms = [
            f"(CAST(q[{i+1}] AS DOUBLE) - CAST({carr}[{i+1}] AS DOUBLE) / {n})"
            f" * (CAST(q[{i+1}] AS DOUBLE) - CAST({carr}[{i+1}] AS DOUBLE) / {n})"
            for i in range(dim)
        ]
        return "(0.0 + " + " + ".join(terms) + ")"

    sum_list = (
        "list_value(" + ", ".join(f"SUM(q[{i+1}])" for i in range(dim)) + ")"
    )
    parts = [
        "WITH qv AS (SELECT vec_id, list_transform(embedding, "
        f"x -> CAST(floor(CAST(x AS DOUBLE) * {scale}) AS BIGINT)) AS q "
        "FROM embeddings), ",
        # init: each of the k lowest vec_ids is its own centroid (n=1)
        f"c0 AS (SELECT CAST(vec_id AS INT) AS cid, q AS s, "
        f"CAST(1 AS BIGINT) AS n FROM qv WHERE vec_id < {k}), ",
    ]
    for t in range(iters):
        d = dist_expr("c.s", "c.n")
        parts.append(
            f"a{t} AS (SELECT vec_id, cid, q FROM ("
            f"SELECT qv.vec_id, c.cid, qv.q, "
            f"ROW_NUMBER() OVER (PARTITION BY qv.vec_id "
            f"ORDER BY {d}, c.cid) AS rn "
            f"FROM qv CROSS JOIN c{t} c) WHERE rn = 1), "
        )
        # update with keep-stale for empty clusters
        parts.append(
            f"u{t} AS (SELECT cid, {sum_list} AS s, COUNT(*) AS n "
            f"FROM a{t} GROUP BY cid), "
            f"c{t+1} AS (SELECT c.cid, COALESCE(u.s, c.s) AS s, "
            f"COALESCE(u.n, c.n) AS n "
            f"FROM c{t} c LEFT JOIN u{t} u USING (cid)), "
        )
    last = iters - 1
    parts.append(f"fin AS (SELECT vec_id, cid FROM a{last}) ")
    parts.append("SELECT vec_id, cid FROM fin")
    return "".join(parts)


def centroid_confusion(emb: DataFrame, scale: int = 1024) -> DataFrame:
    """Nearest-centroid classifier evaluation: fit one centroid per
    LABEL (integer-quantized mean — exact, order-independent), assign
    every vector to its nearest centroid (pinned-fold L2, ties to the
    lowest label), and emit the confusion matrix (label, pred, n) —
    the separability diagnostic for an embedding space, engine-exact
    end to end (same arithmetic contract as :func:`kmeans_lloyd`)."""
    spark = emb.sparkSession
    q = _quantize(emb, scale).join(
        emb.select("vec_id", "label"), "vec_id"
    ).persist()
    try:
        dim = len(q.select("q").first()["q"])
        sums = (
            q.select("label", F.posexplode("q").alias("pos", "v"))
            .groupBy("label", "pos")
            .agg(F.sum("v").alias("s"), F.count("*").alias("n"))
            .collect()
        )
        by_label: dict = {}
        for r in sums:
            by_label.setdefault(int(r["label"]), [None] * dim)[r["pos"]] = (
                int(r["s"]),
                int(r["n"]),
            )
        labels = sorted(by_label)
        cents = [[s / n for (s, n) in by_label[l]] for l in labels]
        assigned = _assign(q.select("vec_id", "q"), cents, spark)
        pred = F.element_at(
            F.array(*[F.lit(l) for l in labels]), F.col("cid") + 1
        )
        return (
            assigned.select("vec_id", pred.alias("pred"))
            .join(q.select("vec_id", "label"), "vec_id")
            .groupBy("label", "pred")
            .agg(F.count("*").alias("n"))
        )
    finally:
        q.unpersist()


def confusion_oracle_sql(scale: int = 1024, dim: int = 64) -> str:
    """DuckDB replay of :func:`centroid_confusion` on ``embeddings``."""

    def dist_expr(carr: str, n: str) -> str:
        terms = [
            f"(CAST(q[{i+1}] AS DOUBLE) - CAST({carr}[{i+1}] AS DOUBLE) / {n})"
            f" * (CAST(q[{i+1}] AS DOUBLE) - CAST({carr}[{i+1}] AS DOUBLE) / {n})"
            for i in range(dim)
        ]
        return "(0.0 + " + " + ".join(terms) + ")"

    sum_list = (
        "list_value(" + ", ".join(f"SUM(q[{i+1}])" for i in range(dim)) + ")"
    )
    return (
        "WITH qv AS (SELECT vec_id, label, list_transform(embedding, "
        f"x -> CAST(floor(CAST(x AS DOUBLE) * {scale}) AS BIGINT)) AS q "
        "FROM embeddings), "
        f"cents AS (SELECT label AS clabel, {sum_list} AS s, COUNT(*) AS n "
        "FROM qv GROUP BY label), "
        "a AS (SELECT vec_id, label, clabel AS pred FROM ("
        "SELECT qv.vec_id, qv.label, c.clabel, "
        "ROW_NUMBER() OVER (PARTITION BY qv.vec_id "
        f"ORDER BY {dist_expr('c.s', 'c.n')}, c.clabel) AS rn "
        "FROM qv CROSS JOIN cents c) WHERE rn = 1) "
        "SELECT label, pred, count(*) AS n FROM a GROUP BY label, pred"
    )
