"""PageRank vs an independent numpy power iteration."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from webx.graph import pagerank_hosts


def _numpy_pagerank(edge_list, iters=10, d=0.85):
    hosts = sorted({a for a, _, _ in edge_list} | {b for _, b, _ in edge_list})
    idx = {h: i for i, h in enumerate(hosts)}
    n = len(hosts)
    W = np.zeros((n, n))
    for a, b, w in edge_list:
        W[idx[a], idx[b]] += w
    out = W.sum(axis=1)
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        contrib = np.zeros(n)
        for i in range(n):
            if out[i] > 0:
                contrib += r[i] * W[i] / out[i]
        dangling = r[out == 0].sum()
        r = (1 - d) / n + d * dangling / n + d * contrib
    return {h: r[idx[h]] for h in hosts}


def test_pagerank_matches_numpy(spark):
    edges = [
        ("a", "b", 2), ("a", "c", 1), ("b", "c", 1),
        ("c", "a", 1), ("d", "a", 3),  # e is dangling (in-edges only)
        ("a", "e", 1),
    ]
    df = spark.createDataFrame(edges, "src_host string, dst_host string, n_links long")
    got = {r["host"]: r["rank"] for r in pagerank_hosts(df, iterations=10).collect()}
    want = _numpy_pagerank(edges, iters=10)
    assert set(got) == set(want)
    for h in want:
        assert abs(got[h] - want[h]) < 1e-9, h
    assert abs(sum(got.values()) - 1.0) < 1e-9
    # link-heavy hub 'a' outranks leaf 'e'... and 'c' (two strong in-edges)
    assert got["a"] > got["e"]


def test_pagerank_uniform_on_symmetric_cycle(spark):
    edges = [("a", "b", 1), ("b", "c", 1), ("c", "a", 1)]
    df = spark.createDataFrame(edges, "src_host string, dst_host string, n_links long")
    got = {r["host"]: r["rank"] for r in pagerank_hosts(df, iterations=12).collect()}
    for v in got.values():
        assert abs(v - 1.0 / 3) < 1e-12


def test_pagerank_int_matches_float_twin(spark):
    """rank/mass of the integer-exact twin tracks the float power
    iteration to ~1/mass-scale error, including dangling handling."""
    from webx.graph import pagerank_hosts_int

    edges = [
        ("a", "b", 2), ("a", "c", 1), ("b", "c", 1),
        ("c", "a", 1), ("d", "a", 3), ("a", "e", 1),  # e dangling
    ]
    df = spark.createDataFrame(edges, "src_host string, dst_host string, n_links long")
    mass = 10**11
    got = {
        r["host"]: r["rank"] / mass
        for r in pagerank_hosts_int(df, iterations=10, mass=mass).collect()
    }
    want = _numpy_pagerank(edges, iters=10)
    assert set(got) == set(want)
    for h in want:
        assert abs(got[h] - want[h]) < 1e-6, h


def test_pagerank_int_partition_independent(spark):
    """The integer ranks are bit-identical under different partitionings
    — the property that makes the DuckDB oracle possible."""
    from webx.graph import pagerank_hosts_int

    edges = [("a", "b", 3), ("b", "a", 1), ("b", "c", 2), ("c", "a", 5)]
    one = spark.createDataFrame(
        edges, "src_host string, dst_host string, n_links long"
    ).coalesce(1)
    many = spark.createDataFrame(
        edges, "src_host string, dst_host string, n_links long"
    ).repartition(16)
    r1 = {r["host"]: r["rank"] for r in pagerank_hosts_int(one, 8).collect()}
    r2 = {r["host"]: r["rank"] for r in pagerank_hosts_int(many, 8).collect()}
    assert r1 == r2


def test_redirect_chains_pointer_doubling(spark):
    """Chain of exactly 2**rounds hops resolves; one hop longer does
    not; 2-cycles and self-loops come back unresolved; hops are exact."""
    from webx.graph import resolve_redirect_chains

    edges = []
    # chain c0 -> c1 -> ... -> c8 (8 hops, == cap at rounds=3)
    edges += [(f"c{i}", f"c{i+1}") for i in range(8)]
    # chain d0 -> ... -> d9 (9 hops, over cap)
    edges += [(f"d{i}", f"d{i+1}") for i in range(9)]
    edges += [("x", "y"), ("y", "x")]  # 2-cycle
    edges += [("z", "z")]  # self-loop
    edges += [("a", "t")]  # single hop
    df = spark.createDataFrame(edges, "url string, location string")
    got = {
        r["url"]: (r["final_url"], r["hops"], r["resolved"])
        for r in resolve_redirect_chains(df, rounds=3).collect()
    }
    assert len(got) == len(edges)
    assert got["c0"] == ("c8", 8, 1)
    assert got["c5"] == ("c8", 3, 1)
    assert got["d0"] == ("", 0, 0)  # 9 hops > 2**3
    assert got["d1"] == ("d9", 8, 1)  # but d1 is only 8 away
    for u in ("x", "y", "z"):
        assert got[u] == ("", 0, 0), u
    assert got["a"] == ("t", 1, 1)


def test_bfs_depth_min_over_multiple_seeds(spark):
    from webx.graph import bfs_depth

    # chain 0->1->2->3->4, seed at 0 AND 3; 9 unreachable; 5<->6 cycle
    # reachable only through 4->5
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (6, 5)],
        ["src", "dst"],
    )
    seeds = spark.createDataFrame([(0,), (3,)], ["node"])
    got = {r["node"]: r["depth"] for r in bfs_depth(edges, seeds).collect()}
    # node 4 is 4 hops from seed 0 but ONE from seed 3 -> min wins
    assert got == {0: 0, 1: 1, 2: 2, 3: 0, 4: 1, 5: 2, 6: 3}
    assert 9 not in got  # unreachable nodes absent, not depth-null


def test_bfs_depth_cap_and_partition_independence(spark):
    from webx.graph import bfs_depth

    # long chain: cap cuts traversal at max_depth
    n = 30
    edges = spark.createDataFrame([(i, i + 1) for i in range(n)], ["src", "dst"])
    seeds = spark.createDataFrame([(0,)], ["node"])
    capped = bfs_depth(edges, seeds, max_depth=7)
    assert capped.count() == 8  # depths 0..7
    assert capped.agg({"depth": "max"}).first()[0] == 7
    # same result on 1 vs 16 partitions
    a = sorted(map(tuple, bfs_depth(edges.coalesce(1), seeds).collect()))
    b = sorted(map(tuple, bfs_depth(edges.repartition(16), seeds).collect()))
    assert a == b


def _numpy_trustrank(edge_list, seeds, iters=6, d=0.85):
    hosts = sorted({a for a, _, _ in edge_list} | {b for _, b, _ in edge_list} | set(seeds))
    idx = {h: i for i, h in enumerate(hosts)}
    n, s = len(hosts), len(seeds)
    W = np.zeros((n, n))
    for a, b, w in edge_list:
        W[idx[a], idx[b]] += w
    out = W.sum(axis=1)
    t = np.zeros(n)
    for h in seeds:
        t[idx[h]] = 1.0 / s
    tele = np.zeros(n)
    for h in seeds:
        tele[idx[h]] = 1.0 / s
    for _ in range(iters):
        contrib = np.zeros(n)
        for i in range(n):
            if out[i] > 0:
                contrib += t[i] * W[i] / out[i]
        dangling = t[out == 0].sum()
        t = (1 - d) * tele + d * dangling * tele + d * contrib
    return {h: t[idx[h]] for h in hosts}


def test_trustrank_int_matches_float_reference(spark):
    from webx.graph import trustrank_int

    edges = [
        ("seed", "good", 2), ("good", "better", 1), ("better", "seed", 1),
        ("spam1", "spam2", 5), ("spam2", "spam1", 5),  # spam ring, unreachable
        ("good", "sink", 1),  # sink is dangling
    ]
    df = spark.createDataFrame(edges, "src_host string, dst_host string, n_links long")
    mass = 10**11
    got = {r["host"]: r["trust"] for r in trustrank_int(df, ["seed"], iterations=6, mass=mass).collect()}
    want = _numpy_trustrank(edges, ["seed"], iters=6)
    for h, w in want.items():
        assert abs(got[h] / mass - w) < 1e-8, h
    # THE TrustRank property: the spam ring inherits nothing
    assert got["spam1"] == 0 and got["spam2"] == 0
    assert got["seed"] > 0 and got["good"] > 0 and got["better"] > 0


def test_trustrank_requires_seeds(spark):
    from webx.graph import trustrank_int

    df = spark.createDataFrame([("a", "b", 1)], "src_host string, dst_host string, n_links long")
    try:
        trustrank_int(df, [])
        assert False, "expected ValueError"
    except ValueError:
        pass
