"""Exact grouped ROC-AUC (webx/metrics.py auc_by_group) vs sklearn-free
reference: a brute-force pairwise comparator (AUC's probabilistic
definition — P(score_pos > score_neg) + ½·P(tie))."""

from __future__ import annotations

import random

from webx.metrics import auc_by_group


def _brute_auc(pairs):
    pos = [s for s, y in pairs if y]
    neg = [s for s, y in pairs if not y]
    if not pos or not neg:
        return None
    wins = sum(1.0 if p > n else 0.5 if p == n else 0.0 for p in pos for n in neg)
    return wins / (len(pos) * len(neg))


def test_matches_pairwise_definition(spark):
    rng = random.Random(17)
    rows = []
    for g in range(5):
        for i in range(rng.randint(20, 60)):
            rows.append((f"g{g}", rng.randint(-5, 5), rng.randint(0, 1)))
    df = spark.createDataFrame(rows, "grp string, score long, label int")
    got = {r.grp: r for r in auc_by_group(df, "score", "label", "grp").collect()}
    for g in range(5):
        grp = f"g{g}"
        pairs = [(s, y) for gg, s, y in rows if gg == grp]
        want = _brute_auc(pairs)
        r = got[grp]
        assert r.n_pos == sum(y for _, y in pairs)
        assert r.n_neg == len(pairs) - r.n_pos
        if want is None:
            assert r.auc is None
        else:
            assert abs(r.auc - want) < 1e-12, (grp, r.auc, want)


def test_degenerate_groups(spark):
    df = spark.createDataFrame(
        [("all_pos", 1, 1), ("all_pos", 2, 1), ("all_neg", 1, 0)],
        "grp string, score long, label int",
    )
    got = {r.grp: r for r in auc_by_group(df, "score", "label", "grp").collect()}
    assert got["all_pos"].auc is None
    assert got["all_neg"].auc is None


def test_perfect_and_inverted(spark):
    rows = [("p", s, 1 if s > 0 else 0) for s in range(-10, 11) if s != 0]
    rows += [("inv", s, 0 if s > 0 else 1) for s in range(-10, 11) if s != 0]
    df = spark.createDataFrame(rows, "grp string, score long, label int")
    got = {r.grp: r.auc for r in auc_by_group(df, "score", "label", "grp").collect()}
    assert got["p"] == 1.0
    assert got["inv"] == 0.0


def test_all_ties_is_half(spark):
    df = spark.createDataFrame(
        [("t", 7, 1), ("t", 7, 0), ("t", 7, 1), ("t", 7, 0)],
        "grp string, score long, label int",
    )
    assert auc_by_group(df, "score", "label", "grp").collect()[0].auc == 0.5
