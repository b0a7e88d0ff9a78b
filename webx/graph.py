"""Host-graph algorithms over the link-graph edge table
(webx.urls.host_link_graph) — the iterative-DataFrame category: a
driver loop of joins/aggregations whose per-iteration plan is fully
relational (each iteration = one shuffle on the edge key), with
periodic ``localCheckpoint`` to keep the lineage from growing
quadratically. PageRank here is the standard damped power iteration
with proper dangling-mass redistribution (Page et al. 1999 — public).

Scale shape: the HOST graph is ~10^7-10^8 nodes for a full crawl
(documents collapse onto hosts first), so ranks and out-degree tables
are small relative to the corpus; at 10 iterations the job is 10
edge-shuffles — embarrassingly standard Spark. Exactness note: float
summation order varies with partitioning, so ranks are reproducible to
~1e-12 relative, not bit-for-bit — the tests compare against a numpy
power iteration at 1e-9.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pagerank_hosts(
    edges: DataFrame,
    iterations: int = 10,
    damping: float = 0.85,
    checkpoint_every: int = 4,
) -> DataFrame:
    """Weighted PageRank over (src_host, dst_host, n_links) edges →
    (host, rank), Σ rank = 1. Self-loops participate like any edge;
    dangling hosts (no out-edges) redistribute their mass uniformly."""
    # Materialize the edge table ONCE. The upstream plan is typically the
    # full HTML link extraction (webx.urls.extract_links over the corpus);
    # every iteration's DAG references `edges`, so without this checkpoint
    # the parse re-runs once per iteration inside each checkpoint window —
    # at crawl scale that is `iterations` extra corpus scans.
    edges = edges.localCheckpoint()
    nodes = (
        edges.select(F.col("src_host").alias("host"))
        .unionByName(edges.select(F.col("dst_host").alias("host")))
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()
    out_w = edges.groupBy("src_host").agg(F.sum("n_links").alias("out_total"))
    # Fold the out-degree join into the edge table once: the per-iteration
    # plan becomes ONE join (ranks) + ONE aggregation instead of re-running
    # the degree shuffle + a second join every iteration.
    norm_edges = (
        edges.join(out_w, "src_host")
        .select("src_host", "dst_host", "n_links", "out_total")
        .localCheckpoint()
    )

    # the dangling SET (hosts without out-edges) is a static property of
    # the graph — compute it once; only its rank MASS changes per
    # iteration, and when the set is empty (common for host graphs:
    # chrome links give every host a self-edge) the per-iteration
    # aggregation action is skipped entirely.
    dangling_nodes = nodes.join(
        out_w.withColumnRenamed("src_host", "host"), "host", "left_anti"
    ).localCheckpoint()
    has_dangling = bool(dangling_nodes.head(1))

    ranks = nodes.select("host", F.lit(1.0 / n).alias("rank"))
    if has_dangling:
        # the per-iteration mass probe is an ACTION on ranks; keep ranks
        # materialized every iteration so the probe scans checkpointed rows
        # instead of replaying the whole window's iteration lineage
        # (the webx/dedup.py label-propagation discipline)
        ranks = ranks.localCheckpoint()
    for i in range(iterations):
        if has_dangling:  # dangling mass redistributes uniformly
            dangling = (
                ranks.join(dangling_nodes, "host", "left_semi")
                .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
                .first()[0]
            )
        else:
            dangling = 0.0
        base = (1.0 - damping) / n + damping * dangling / n
        contribs = (
            norm_edges.join(ranks.withColumnRenamed("host", "src_host"), "src_host")
            .select(
                F.col("dst_host").alias("host"),
                (F.col("rank") * F.col("n_links") / F.col("out_total")).alias("c"),
            )
            .groupBy("host")
            .agg(F.sum("c").alias("in_mass"))
        )
        ranks = (
            nodes.join(contribs, "host", "left")
            .select(
                "host",
                (
                    F.lit(base) + F.lit(damping) * F.coalesce("in_mass", F.lit(0.0))
                ).alias("rank"),
            )
        )
        if has_dangling or (i + 1) % checkpoint_every == 0:
            ranks = ranks.localCheckpoint()
    return ranks


def pagerank_hosts_int(
    edges: DataFrame,
    iterations: int = 6,
    mass: int = 10**11,
    damp_num: int = 85,
    damp_den: int = 100,
    checkpoint_every: int = 4,
) -> DataFrame:
    """Integer-exact PageRank → (host, rank: bigint), engine-exact.

    The float power iteration is not oracle-checkable (sum order flips
    the last ulp); this twin applies the webx/kmeans.py quantization
    discipline to the iterative graph algorithm: rank is an integer
    MASS (Σ r_0 = ``mass``), every step is floor division + integer
    sums — both order-independent — so the (host, rank) table after any
    number of iterations is identical on any partitioning, cluster
    size, or engine, and a DuckDB oracle replays all iterations as
    unrolled CTEs. Mass leaks a few units per step to the floors
    (deterministically); rank/mass ≈ the float PageRank to ~1/mass.

    Per iteration: edge contribution ``(r(u) * w) DIV out(u)`` (requires
    max rank × max edge weight < 2^63 — at mass=10^11 that allows edge
    weights to ~9×10^7), damped in-sum ``(damp_num * Σc) DIV damp_den``,
    uniform base ``((damp_den-damp_num) * mass) DIV (damp_den * n)``,
    dangling share ``(damp_num * (D DIV n)) DIV damp_den``. Same
    one-shuffle-per-iteration shape as :func:`pagerank_hosts`."""
    edges = edges.localCheckpoint()
    nodes = (
        edges.select(F.col("src_host").alias("host"))
        .unionByName(edges.select(F.col("dst_host").alias("host")))
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()
    out_w = edges.groupBy("src_host").agg(F.sum("n_links").alias("out_total"))
    norm_edges = (
        edges.join(out_w, "src_host")
        .select("src_host", "dst_host", "n_links", "out_total")
        .localCheckpoint()
    )
    dangling_nodes = nodes.join(
        out_w.withColumnRenamed("src_host", "host"), "host", "left_anti"
    ).localCheckpoint()
    has_dangling = bool(dangling_nodes.head(1))

    base = ((damp_den - damp_num) * mass) // (damp_den * n)
    ranks = nodes.select("host", F.lit(mass // n).cast("long").alias("rank"))
    if has_dangling:
        ranks = ranks.localCheckpoint()
    for i in range(iterations):
        if has_dangling:
            d_total = (
                ranks.join(dangling_nodes, "host", "left_semi")
                .agg(F.coalesce(F.sum("rank"), F.lit(0)))
                .first()[0]
            )
        else:
            d_total = 0
        dang_share = (damp_num * (int(d_total) // n)) // damp_den
        contribs = (
            norm_edges.join(ranks.withColumnRenamed("host", "src_host"), "src_host")
            .select(
                F.col("dst_host").alias("host"),
                F.expr("(rank * n_links) DIV out_total").alias("c"),
            )
            .groupBy("host")
            .agg(F.sum("c").alias("in_mass"))
        )
        ranks = nodes.join(contribs, "host", "left").select(
            "host",
            (
                F.lit(base).cast("long")
                + F.lit(dang_share).cast("long")
                + F.expr(
                    f"({damp_num} * coalesce(in_mass, 0L)) DIV {damp_den}"
                )
            ).alias("rank"),
        )
        if has_dangling or (i + 1) % checkpoint_every == 0:
            ranks = ranks.localCheckpoint()
    return ranks


def trustrank_int(
    edges: DataFrame,
    seeds: list,
    iterations: int = 6,
    mass: int = 10**11,
    damp_num: int = 85,
    damp_den: int = 100,
    checkpoint_every: int = 4,
) -> DataFrame:
    """Integer-exact TrustRank (Gyöngyi, Garcia-Molina & Pedersen 2004)
    → (host, trust: bigint): PageRank with the teleport vector
    restricted to a TRUSTED seed set — trust flows outward from
    hand-vetted hosts, so link farms that bootstrap each other inherit
    ~none of it. The standard crawl-frontier spam demotion signal; the
    gap pagerank alone leaves (spam rings rank themselves up).

    Same quantization discipline as :func:`pagerank_hosts_int` (integer
    mass, floor division, order-independent sums ⇒ engine-exact,
    unrolled-CTE oracle): initial mass and all teleports (the (1-d)
    base AND the dangling redistribution) go uniformly to the |S| seeds
    instead of all n nodes; every other step is identical. Same
    one-shuffle-per-iteration shape."""
    seeds = sorted(set(seeds))
    s = len(seeds)
    if not s:
        raise ValueError("TrustRank needs at least one trusted seed")
    spark = edges.sparkSession
    edges = edges.localCheckpoint()
    seed_df = spark.createDataFrame([(h,) for h in seeds], "host string")
    nodes = (
        edges.select(F.col("src_host").alias("host"))
        .unionByName(edges.select(F.col("dst_host").alias("host")))
        .unionByName(seed_df)
        .distinct()
        .localCheckpoint()
    )
    out_w = edges.groupBy("src_host").agg(F.sum("n_links").alias("out_total"))
    norm_edges = (
        edges.join(out_w, "src_host")
        .select("src_host", "dst_host", "n_links", "out_total")
        .localCheckpoint()
    )
    dangling_nodes = nodes.join(
        out_w.withColumnRenamed("src_host", "host"), "host", "left_anti"
    ).localCheckpoint()
    has_dangling = bool(dangling_nodes.head(1))

    is_seed = F.col("host").isin(seeds)
    base = ((damp_den - damp_num) * mass) // (damp_den * s)
    ranks = nodes.select(
        "host",
        F.when(is_seed, F.lit(mass // s)).otherwise(F.lit(0)).cast("long").alias(
            "trust"
        ),
    )
    if has_dangling:
        ranks = ranks.localCheckpoint()
    for i in range(iterations):
        if has_dangling:
            d_total = (
                ranks.join(dangling_nodes, "host", "left_semi")
                .agg(F.coalesce(F.sum("trust"), F.lit(0)))
                .first()[0]
            )
        else:
            d_total = 0
        dang_share = (damp_num * (int(d_total) // s)) // damp_den
        contribs = (
            norm_edges.join(
                ranks.withColumnRenamed("host", "src_host"), "src_host"
            )
            .select(
                F.col("dst_host").alias("host"),
                F.expr("(trust * n_links) DIV out_total").alias("c"),
            )
            .groupBy("host")
            .agg(F.sum("c").alias("in_mass"))
        )
        ranks = nodes.join(contribs, "host", "left").select(
            "host",
            (
                F.when(is_seed, F.lit(base + dang_share)).otherwise(F.lit(0))
                + F.expr(f"({damp_num} * coalesce(in_mass, 0L)) DIV {damp_den}")
            ).cast("long").alias("trust"),
        )
        if has_dangling or (i + 1) % checkpoint_every == 0:
            ranks = ranks.localCheckpoint()
    return ranks


def trustrank_int_oracle_sql(
    edges_sql: str,
    seeds: list,
    iterations: int = 6,
    mass: int = 10**11,
    damp_num: int = 85,
    damp_den: int = 100,
) -> str:
    """DuckDB replay of :func:`trustrank_int` — the pagerank_int oracle
    with the teleport terms gated on seed membership."""
    seeds = sorted(set(seeds))
    s = len(seeds)
    seed_vals = ", ".join(f"('{h}')" for h in seeds)
    base = ((damp_den - damp_num) * mass) // (damp_den * s)
    parts = [
        f"WITH e AS ({edges_sql}), ",
        f"seeds(host) AS (VALUES {seed_vals}), ",
        "outd AS (SELECT src_host, SUM(n_links) AS o FROM e GROUP BY src_host), ",
        "nodes AS (SELECT src_host AS host FROM e "
        "UNION SELECT dst_host FROM e UNION SELECT host FROM seeds), ",
        f"r0 AS (SELECT nodes.host, CASE WHEN seeds.host IS NULL THEN 0 "
        f"ELSE {mass} // {s} END AS r FROM nodes "
        "LEFT JOIN seeds ON seeds.host = nodes.host), ",
    ]
    for t in range(iterations):
        parts.append(
            f"c{t} AS (SELECT e.dst_host AS host, "
            f"SUM((r.r * e.n_links) // outd.o) AS im "
            f"FROM e JOIN outd USING (src_host) "
            f"JOIN r{t} r ON r.host = e.src_host GROUP BY e.dst_host), "
        )
        parts.append(
            f"d{t} AS (SELECT COALESCE(SUM(r.r), 0) AS dt FROM r{t} r "
            "LEFT JOIN outd ON r.host = outd.src_host "
            "WHERE outd.src_host IS NULL), "
        )
        parts.append(
            f"r{t+1} AS (SELECT nodes.host, "
            f"CASE WHEN seeds.host IS NULL THEN 0 ELSE "
            f"{base} + ({damp_num} * (dt // {s})) // {damp_den} END "
            f"+ ({damp_num} * COALESCE(c{t}.im, 0)) // {damp_den} AS r "
            f"FROM nodes CROSS JOIN d{t} "
            f"LEFT JOIN seeds ON seeds.host = nodes.host "
            f"LEFT JOIN c{t} ON c{t}.host = nodes.host), "
        )
    parts[-1] = parts[-1][:-2] + " "
    parts.append(f"SELECT host, CAST(r AS BIGINT) AS trust FROM r{iterations}")
    return "".join(parts)


def resolve_redirect_chains(edges: DataFrame, rounds: int = 3) -> DataFrame:
    """HTTP 3xx redirect chains → terminal targets by pointer doubling.

    ``edges``: (url, location) — one outgoing redirect per source url
    (an HTTP response carries exactly one Location). Returns one row
    per source: (url, final_url, hops, resolved) where ``final_url`` is
    the first non-redirecting target reached within ``2**rounds`` hops
    and ``hops`` counts edges traversed; redirect LOOPS and chains
    longer than the cap come back (``''``, 0, resolved=0) — a crawler
    treats both as dead ends.

    Pointer doubling: each round composes the partial-resolution map
    with itself (f ← f∘f), so chains of length ≤ 2^rounds resolve in
    ``rounds`` self-joins — O(log chain) shuffles instead of the O(chain)
    a hop-at-a-time walk pays; the map is checkpointed per round because
    BOTH join sides reference it (without that the lineage doubles every
    round). At crawl scale the edge table is the 3xx slice of the fetch
    log — tiny next to the corpus — and every join here is on its key."""
    e = edges.select("url", "location").localCheckpoint()
    sources = e.select("url").distinct().localCheckpoint()
    f = e.select(
        "url",
        F.col("location").alias("next"),
        F.lit(1).cast("long").alias("hops"),
    )
    for _ in range(rounds):
        g = f.select(
            F.col("url").alias("g_url"),
            F.col("next").alias("g_next"),
            F.col("hops").alias("g_hops"),
        )
        f = (
            f.join(g, f["next"] == g["g_url"], "left")
            .select(
                "url",
                F.coalesce("g_next", "next").alias("next"),
                (F.col("hops") + F.coalesce("g_hops", F.lit(0))).alias("hops"),
            )
            .localCheckpoint()
        )
    live = sources.select(F.col("url").alias("next"), F.lit(1).alias("live"))
    return f.join(live, "next", "left").select(
        "url",
        F.when(F.col("live").isNull(), F.col("next")).otherwise(F.lit("")).alias(
            "final_url"
        ),
        F.when(F.col("live").isNull(), F.col("hops"))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("hops"),
        F.when(F.col("live").isNull(), F.lit(1)).otherwise(F.lit(0)).alias(
            "resolved"
        ),
    )


def redirect_oracle_sql(edges_sql: str, rounds: int = 3) -> str:
    """DuckDB replay of :func:`resolve_redirect_chains`: a recursive CTE
    walks each chain hop-at-a-time up to the same ``2**rounds`` cap; the
    first terminal row per source wins, sources with none (loops,
    over-length chains) come back ('', 0, 0)."""
    cap = 2**rounds
    return (
        f"WITH RECURSIVE e AS ({edges_sql}), "
        "walk(url, cur, hops) AS ("
        "SELECT url, location, 1 FROM e "
        "UNION ALL SELECT w.url, e2.location, w.hops + 1 FROM walk w "
        f"JOIN e e2 ON w.cur = e2.url WHERE w.hops < {cap}), "
        "term AS (SELECT url, cur, hops, "
        "ROW_NUMBER() OVER (PARTITION BY url ORDER BY hops) AS rn "
        "FROM walk WHERE cur NOT IN (SELECT url FROM e)) "
        "SELECT s.url, COALESCE(t.cur, '') AS final_url, "
        "CAST(COALESCE(t.hops, 0) AS BIGINT) AS hops, "
        "CASE WHEN t.url IS NULL THEN 0 ELSE 1 END AS resolved "
        "FROM (SELECT DISTINCT url FROM e) s "
        "LEFT JOIN term t ON t.url = s.url AND t.rn = 1"
    )


def pagerank_int_oracle_sql(
    edges_sql: str,
    iterations: int = 6,
    mass: int = 10**11,
    damp_num: int = 85,
    damp_den: int = 100,
) -> str:
    """DuckDB replay of :func:`pagerank_hosts_int`: ``edges_sql`` must
    select (src_host, dst_host, n_links); iterations unroll as CTEs
    (the webx/kmeans.py oracle precedent for iterative algorithms)."""
    parts = [
        f"WITH e AS ({edges_sql}), ",
        "outd AS (SELECT src_host, SUM(n_links) AS o FROM e GROUP BY src_host), ",
        "nodes AS (SELECT src_host AS host FROM e "
        "UNION SELECT dst_host FROM e), ",
        "nn AS (SELECT COUNT(*) AS n FROM nodes), ",
        f"r0 AS (SELECT host, {mass} // n AS r FROM nodes CROSS JOIN nn), ",
    ]
    for t in range(iterations):
        parts.append(
            f"c{t} AS (SELECT e.dst_host AS host, "
            f"SUM((r.r * e.n_links) // outd.o) AS im "
            f"FROM e JOIN outd USING (src_host) "
            f"JOIN r{t} r ON r.host = e.src_host GROUP BY e.dst_host), "
        )
        parts.append(
            f"d{t} AS (SELECT COALESCE(SUM(r.r), 0) AS dt FROM r{t} r "
            "LEFT JOIN outd ON r.host = outd.src_host "
            "WHERE outd.src_host IS NULL), "
        )
        parts.append(
            f"r{t+1} AS (SELECT nodes.host, "
            f"(({damp_den} - {damp_num}) * {mass}) // ({damp_den} * n) "
            f"+ ({damp_num} * (dt // n)) // {damp_den} "
            f"+ ({damp_num} * COALESCE(c{t}.im, 0)) // {damp_den} AS r "
            f"FROM nodes CROSS JOIN nn CROSS JOIN d{t} "
            f"LEFT JOIN c{t} ON c{t}.host = nodes.host), "
        )
    # strip the trailing comma-space from the last CTE
    parts[-1] = parts[-1][:-2] + " "
    parts.append(f"SELECT host, CAST(r AS BIGINT) AS rank FROM r{iterations}")
    return "".join(parts)


def bfs_depth(
    edges: DataFrame,
    seeds: DataFrame,
    max_depth: int = 12,
) -> DataFrame:
    """Multi-source BFS over directed (src, dst) edges → (node, depth)
    with depth = the MINIMUM hop count from any seed; unreached nodes
    are absent. The crawl-depth audit: how many link hops separate each
    page/host from the seed list — the frontier-scheduling signal
    (depth caps, politeness budgets per ring) and the classic
    "19 clicks of separation" web-structure measurement.

    Level-synchronous frontier expansion (Pregel-style, the
    ``pagerank_hosts`` driver-loop discipline): each level is ONE join
    frontier⋈edges + an anti-join against the visited set — both
    shuffles on the node key, so successive levels reuse the same
    hash partitioning. Exactly ONE eager job per level (the frontier's
    ``localCheckpoint``; the emptiness probe reads the already-
    materialized checkpoint): the visited set is kept as a LAZY union
    of the per-level checkpoints, never re-materialized, so per-level
    driver cost is one job and the anti-join scans ≤ depth tiny cached
    frames. The loop exits as soon as a frontier comes back empty
    (diameter-bounded, not cap-bounded, on connected graphs). Depth is
    an exact integer — first-visit level IS the shortest distance in an
    unweighted graph — so the whole result carries a full value oracle
    (recursive-CTE min-depth replay), unlike float graph scores.

    Reference analogy: mindocr walks its dataset roots breadth-first to
    enumerate samples (mindocr/data/utils/get_image_paths); here the
    breadth-first walk IS the analytic output.
    """
    seeds0 = (
        seeds.select(F.col("node").cast("long").alias("node"))
        .distinct()
        .localCheckpoint()
    )
    levels = [seeds0.select("node", F.lit(0).cast("int").alias("depth"))]
    frontier = seeds0
    visited_nodes = seeds0
    e = edges.select(
        F.col("src").cast("long").alias("src"), F.col("dst").cast("long").alias("dst")
    )
    for d in range(1, max_depth + 1):
        nxt = (
            frontier.join(e, frontier["node"] == e["src"])
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited_nodes, "node", "left_anti")
            .localCheckpoint()
        )
        if not nxt.head(1):
            break
        levels.append(nxt.select("node", F.lit(d).cast("int").alias("depth")))
        visited_nodes = visited_nodes.unionByName(nxt)  # lazy: checkpointed parts
        frontier = nxt
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return out
