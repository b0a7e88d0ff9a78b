from __future__ import annotations

import json

from pyspark.sql import functions as F


def test_incremental_job_end_to_end(spark, tmp_path, capsys):
    from jobs.incremental import main
    from webx.config import ExtractConfig
    from webx.pipeline import run_extraction
    from webx import synth

    docs = synth.load_documents(spark, "/root/testdata/sf0.001")
    old_pages = synth.flagship_pages_from_docs(docs)
    new_docs = docs.filter(F.col("doc_id") % 4 != 0).withColumn(
        "text",
        F.when(F.col("doc_id") % 4 == 1, F.concat(F.col("text"), F.lit(" edited")))
        .otherwise(F.col("text")),
    )
    new_pages = synth.flagship_pages_from_docs(new_docs)

    old_p, new_p = str(tmp_path / "old"), str(tmp_path / "new")
    prev_p, out_p = str(tmp_path / "prev"), str(tmp_path / "out")
    old_pages.write.parquet(old_p)
    new_pages.write.parquet(new_p)
    prev = run_extraction(spark.read.parquet(old_p), ExtractConfig())
    prev.withColumn("spans_json", F.to_json("spans")).drop("meta").write.parquet(prev_p)
    # prev output keeps 'spans' too so the schemas line up for the carry
    # (the job unions on fresh.columns; run_extraction emits spans+meta)

    rc = main(["--old", old_p, "--new", new_p,
               "--prev-output", prev_p, "--output", out_p])
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    n = docs.count()
    n_del = docs.filter(F.col("doc_id") % 4 == 0).count()
    n_chg = docs.filter(F.col("doc_id") % 4 == 1).count()
    assert report["deleted"] == n_del
    assert report["reextracted"] == n_chg
    assert report["carried"] == n - n_del - n_chg
    assert report["out_rows"] == n - n_del

    got = spark.read.parquet(out_p).select("url", "text")
    want = run_extraction(new_pages, ExtractConfig()).select("url", "text")
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
