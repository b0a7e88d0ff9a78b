"""Packaging + spark-submit system test (SURVEY §2.1 'model export /
package', previously manual-smoke only): build webx.zip with
scripts/package.sh, then run the checkpointed extraction job via a real
``spark-submit --py-files`` subprocess from a NEUTRAL cwd — so the
``import webx`` inside jobs/extract.py must resolve from the zip, not
from the repo checkout — and assert the output table and per-partition
lineage rows landed."""

from __future__ import annotations

import os
import shutil
import subprocess
import zipfile

import pytest

from tests.conftest import SF_SMALL

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_package_script_contents(tmp_path):
    out = subprocess.run(
        [os.path.join(REPO, "scripts", "package.sh"), str(tmp_path)],
        check=True, capture_output=True, text=True,
    ).stdout.strip()
    assert out.endswith("webx.zip")
    names = zipfile.ZipFile(out).namelist()
    assert "webx/__init__.py" in names
    assert "webx/extract.py" in names
    assert "webx/_ctok.c" in names  # the kernel source ships; compiled on import
    assert not any(n.endswith(".so") for n in names)  # no host-built binaries


@pytest.mark.skipif(shutil.which("spark-submit") is None,
                    reason="spark-submit not on PATH")
def test_spark_submit_py_files_end_to_end(tmp_path):
    zip_path = subprocess.run(
        [os.path.join(REPO, "scripts", "package.sh"), str(tmp_path)],
        check=True, capture_output=True, text=True,
    ).stdout.strip()
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    run = subprocess.run(
        [
            "spark-submit", "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--py-files", zip_path,
            os.path.join(REPO, "jobs", "extract.py"),
            "--synth", SF_SMALL,
            "--output", out_dir,
            "--checkpoint", ckpt,
            "--run-id", "submit-smoke",
            "--snapshot-id", "s1",
            "--n-partitions", "4",
            "--chunk-size", "4",
        ],
        cwd=str(tmp_path),  # neutral cwd: webx must come from the zip
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert run.returncode == 0, run.stderr[-4000:]
    import duckdb

    n_out = duckdb.sql(
        f"SELECT count(*) FROM '{out_dir}/**/*.parquet'"
    ).fetchone()[0]
    lineage = duckdb.sql(
        f"SELECT count(*), sum(row_count) FROM '{ckpt}/*.parquet'"
    ).fetchone()
    assert n_out > 0
    assert lineage[0] == 4  # one lineage row per logical partition
    assert lineage[1] == n_out
