from __future__ import annotations

from webx.textstats import SCRIPT_RANGES, script_profile


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_script_profile_counts_and_dominance(spark):
    rows = {
        r["doc_id"]: r
        for r in script_profile(
            _docs(
                spark,
                [
                    "Hello world",          # pure latin
                    "Привет мир",           # cyrillic + space
                    "abc αβγδ",             # 3 latin vs 4 greek
                    "你好 hi",               # 2 cjk vs 2 latin -> tie, latin listed first
                    "مرحبا",                # arabic only
                    "12345 !!",             # no letters at all -> all zero, latin default
                ],
            )
        ).collect()
    }
    assert rows[0]["n_latin"] == 10 and rows[0]["dominant_script"] == "latin"
    assert rows[1]["n_cyrillic"] == 9 and rows[1]["dominant_script"] == "cyrillic"
    assert rows[2]["dominant_script"] == "greek"
    assert rows[3]["n_cjk"] == 2 and rows[3]["dominant_script"] == "latin"  # tie keeps first
    assert rows[4]["dominant_script"] == "arabic"
    assert all(rows[5][f"n_{n}"] == 0 for n, _ in SCRIPT_RANGES)
    assert rows[5]["dominant_script"] == "latin"


def test_script_profile_is_codegen_only(spark):
    plan = (
        script_profile(_docs(spark, ["x"]))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan and "Python" not in plan
