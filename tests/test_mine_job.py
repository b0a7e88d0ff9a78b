"""jobs/mine.py — the multimodal mining fan-out job."""

from __future__ import annotations

import json


def test_mine_job_lanes(spark, tmp_path, capsys):
    """Every lane writes an independent table; flagship pages yield 500
    text-only interleaved rows (one span per page, no imgs) and empty
    but VALID tables for the media/code/math lanes."""
    from jobs.mine import main

    out = str(tmp_path / "mined")
    rc = main([
        "--synth", "/root/testdata/sf0.001", "--output", out,
        "--lanes", "all",
    ])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["lanes"]["interleaved"] == 500
    assert summary["lanes"]["captions"] == 0
    inter = spark.read.parquet(f"{out}/interleaved")
    assert inter.filter("kind = 'text'").count() == 500
    assert set(inter.columns) == {"url", "seq", "kind", "text", "src", "alt"}
    # empty lanes still wrote readable tables with the right schema
    assert spark.read.parquet(f"{out}/code").columns == [
        "url", "block_idx", "lang_hint", "code", "n_lines",
    ]
    # flagship pages carry no <table> markup: the exact table lane is
    # empty but valid with the cell schema
    assert summary["lanes"]["tables"] == 0
    assert spark.read.parquet(f"{out}/tables").columns == [
        "url", "table_idx", "row_idx", "col_idx", "header", "cell",
        "caption",
    ]
    # flagship pages have no comment regions: one row per page, all
    # comment_text empty
    assert summary["lanes"]["comments"] == 500
    com = spark.read.parquet(f"{out}/comments")
    assert com.filter("comment_text != ''").count() == 0
