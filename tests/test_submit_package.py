"""spark-submit --py-files packaging: the deployment path the north rule
names ("packaged for spark-submit --py-files") exercised for real.

The reference ships a deployment packaging step and smoke-runs the full
CLI pipeline in its system tests (tests/st/test_train_eval_dummy.py runs
tools/train.py as a subprocess); this is the analog for our submit
artifact: build webx.zip with scripts/package.sh, launch a REAL
`spark-submit --py-files webx.zip jobs/extract.py` subprocess from a cwd
where `webx` is NOT importable from the filesystem (so every import —
driver and executor side, including the C-kernel source compiled from
zip resources via importlib, webx/ctokenize.py:63) must come from the
zip, and assert the job's output is byte-identical to the in-process
extraction over the same synth corpus.
"""

from __future__ import annotations

import json
import os
import subprocess
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def webx_zip(tmp_path_factory):
    out = tmp_path_factory.mktemp("pkg")
    res = subprocess.run(
        [os.path.join(REPO, "scripts", "package.sh"), str(out)],
        capture_output=True,
        text=True,
        check=True,
    )
    return res.stdout.strip()


def test_zip_contents(webx_zip):
    names = set(zipfile.ZipFile(webx_zip).namelist())
    # every runtime module, the C-kernel SOURCE (compiled per-host from
    # zip resources), and nothing host-specific (no .so) or test-only
    assert "webx/extract.py" in names
    assert "webx/pipeline.py" in names
    assert "webx/lineage.py" in names
    assert "webx/synth.py" in names
    assert "webx/_ctok.c" in names
    assert not any(n.endswith(".so") for n in names)
    assert not any(n.startswith("tests/") for n in names)
    py_on_disk = {
        f"webx/{f}"
        for f in os.listdir(os.path.join(REPO, "webx"))
        if f.endswith(".py")
    }
    assert py_on_disk <= names, py_on_disk - names


def test_spark_submit_extract_job(webx_zip, tmp_path, spark):
    """End-to-end: zip → spark-submit subprocess → parquet output
    byte-identical to the in-process run."""
    outdir = tmp_path / "out"
    ckpt = tmp_path / "ckpt"
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # webx must resolve from --py-files only
    res = subprocess.run(
        [
            "spark-submit",
            "--master",
            "local[2]",
            "--py-files",
            webx_zip,
            os.path.join(REPO, "jobs", "extract.py"),
            "--synth",
            SF,
            "--output",
            str(outdir),
            "--checkpoint",
            str(ckpt),
            "--run-id",
            "pkg-smoke",
            "--n-partitions",
            "8",
            "--chunk-size",
            "4",
        ],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),  # NOT the repo: filesystem webx is invisible
        env=env,
        timeout=600,
    )
    assert res.returncode == 0, res.stderr[-4000:]
    summary = json.loads(res.stdout.strip().splitlines()[-1])
    assert summary["run_id"] == "pkg-smoke"
    assert summary["partitions_processed"] == 8
    assert summary["err_total"] == 0
    assert summary["rows_total"] > 0

    from webx import synth
    from webx.config import ExtractConfig
    from webx.pipeline import run_extraction

    got = {
        (r["url"], r["text"])
        for r in spark.read.parquet(str(outdir)).select("url", "text").collect()
    }
    want = {
        (r["url"], r["text"])
        for r in run_extraction(synth.synth_pages(spark, SF), ExtractConfig())
        .select("url", "text")
        .collect()
    }
    assert len(got) == summary["rows_total"]
    assert got == want  # byte-identical extracted text per url
