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
