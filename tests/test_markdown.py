"""Markdown lane tests — closed-form expectations from the frozen synth
template (generate-input-from-expected-output)."""

from __future__ import annotations

from webx import synth
from webx.markdown import run_markdown

SF = "/root/testdata/sf0.001"


def test_flagship_markdown_closed_form(spark):
    pages = synth.synth_pages(spark, SF)
    got = {r.url: r for r in run_markdown(pages).collect()}
    exp = {
        r.url: f"# Doc {r.doc_id}\n\n{r.norm}"
        for r in synth.load_documents(spark, SF)
        .select(
            "doc_id",
            synth._url().alias("url"),
            synth._norm(synth.F.col("text")).alias("norm"),
        )
        .collect()
    }
    assert len(got) == len(exp)
    for url, md in exp.items():
        assert got[url].markdown == md
        assert got[url].n_headings == 1
        assert got[url].status == "ok"


def test_multispan_markdown_levels(spark):
    pages = synth.synth_pages_multi(spark, SF)
    got = {r.url: r for r in run_markdown(pages).collect()}
    docs = {
        r.url: r
        for r in synth.load_documents(spark, SF)
        .select(
            "doc_id",
            synth._url().alias("url"),
            synth._norm(synth.F.col("text")).alias("norm"),
        )
        .collect()
    }
    for url, d in docs.items():
        exp = f"# Doc {d.doc_id}\n\n{d.norm}\n\n## Notes\n\n{d.norm.upper()}"
        assert got[url].markdown == exp
        assert got[url].n_headings == 2


def test_empty_html(spark):
    df = spark.createDataFrame([("u", None), ("v", b"")], "url string, html binary")
    got = {r.url: r for r in run_markdown(df).collect()}
    assert got["u"].markdown == "" and got["u"].status == "empty"
    assert got["v"].markdown == "" and got["v"].status == "empty"
