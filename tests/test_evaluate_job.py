"""jobs/evaluate.py — the tools/eval.py / res_eval.py analog: saved
extraction output vs golden files → perf dict."""

from __future__ import annotations

import json
import os
import sys

JOBS_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "jobs")


def test_evaluate_job_end_to_end(spark, tmp_path):
    sys.path.insert(0, JOBS_DIR)
    import evaluate as EV

    # saved "extraction output": 2 docs, one exact match, one off-by-one
    pred = spark.createDataFrame(
        [
            ("u1", "hello world", json.dumps([{"start": 0, "end": 11, "kind": "content"}])),
            ("u2", "goodbye", json.dumps([{"start": 5, "end": 12, "kind": "content"}])),
        ],
        "url string, text string, spans_json string",
    )
    pred_path = str(tmp_path / "pred")
    pred.write.parquet(pred_path)

    gt_text = tmp_path / "gt.tsv"
    gt_text.write_text("u1\thello world\nu2\tgoodbye!\n")
    gt_labels = tmp_path / "gt_labels.txt"
    gt_labels.write_text(
        "u1\t" + json.dumps([{"start": 0, "end": 11, "kind": "content"}]) + "\n"
        "u2\t" + json.dumps([{"start": 100, "end": 120, "kind": "content"}]) + "\n"
    )

    args = EV.parse_args(
        [
            "--pred", pred_path,
            "--golden-text", str(gt_text),
            "--golden-labels", str(gt_labels),
        ]
    )
    perf = EV.run(spark, args)
    assert perf["n_pred"] == 2
    assert (perf["n_docs"], perf["n_correct"], perf["acc"]) == (2, 1, 0.5)
    # u1's span matches (IoU 1.0); u2's golden is elsewhere -> tp=1 of 2
    assert (perf["n_golden"], perf["tp"]) == (2, 1)
    assert perf["precision"] == 0.5 and perf["recall"] == 0.5


def test_missing_predictions_surface_in_perf(spark, tmp_path):
    """Golden docs with no prediction row must be visible (missing_pred),
    not silently excluded from the accuracy denominator."""
    sys.path.insert(0, JOBS_DIR)
    import evaluate as EV

    pred = spark.createDataFrame(
        [("u1", "hello", json.dumps([]))],
        "url string, text string, spans_json string",
    )
    pred_path = str(tmp_path / "pred")
    pred.write.parquet(pred_path)
    gt = tmp_path / "gt.tsv"
    gt.write_text("u1\thello\nu2\tnever extracted\nu3\talso missing\n")
    perf = EV.run(spark, EV.parse_args(["--pred", pred_path, "--golden-text", str(gt)]))
    assert perf["n_golden_text"] == 3
    assert perf["n_docs"] == 1 and perf["missing_pred"] == 2
    assert perf["acc"] == 1.0  # over scored pairs, with the gap visible


def test_manifest_sweep_one_row_per_fixture(spark, tmp_path):
    sys.path.insert(0, JOBS_DIR)
    import evaluate as EV

    # two fixture sets with different accuracy, plus one broken path —
    # the sweep must report all three without aborting
    p1 = spark.createDataFrame(
        [("u1", "alpha", "[]")], "url string, text string, spans_json string"
    )
    p2 = spark.createDataFrame(
        [("u1", "beta", "[]"), ("u2", "gamma", "[]")],
        "url string, text string, spans_json string",
    )
    path1, path2 = str(tmp_path / "p1"), str(tmp_path / "p2")
    p1.write.parquet(path1)
    p2.write.parquet(path2)
    g1 = tmp_path / "g1.tsv"
    g1.write_text("u1\talpha\n")
    g2 = tmp_path / "g2.tsv"
    g2.write_text("u1\tbeta\nu2\tWRONG\n")

    manifest = tmp_path / "fixtures.json"
    manifest.write_text(json.dumps([
        {"name": "setA", "pred": path1, "golden_text": str(g1)},
        {"name": "setB", "pred": path2, "golden_text": str(g2)},
        {"name": "broken", "pred": str(tmp_path / "missing")},
    ]))
    args = EV.parse_args(["--manifest", str(manifest)])
    out = EV.run_sweep(spark, args)
    assert out["n_fixtures"] == 3
    assert out["fixtures"]["setA"]["acc"] == 1.0
    assert out["fixtures"]["setB"]["acc"] == 0.5
    assert out["fixtures"]["setB"]["n_docs"] == 2
    assert "error" in out["fixtures"]["broken"]
    assert all("elapsed_sec" in v for v in out["fixtures"].values())


def test_manifest_and_pred_are_mutually_exclusive():
    sys.path.insert(0, JOBS_DIR)
    import evaluate as EV
    import pytest

    with pytest.raises(SystemExit):
        EV.parse_args(["--pred", "/x", "--manifest", "/y"])
    with pytest.raises(SystemExit):
        EV.parse_args([])
