from __future__ import annotations

from pyspark.sql import functions as F

from webx.pii import PII_PATTERNS, with_pii


def _rows(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_pii_detect_and_redact(spark):
    df = with_pii(
        _rows(
            spark,
            [
                "Mail me at alice.smith+tag@sub.example.org please.",
                "Call +1-555-010-1234 or +44-207-946-0958 now.",
                "Hosts 10.0.0.1 and 192.168.255.254 are up.",
                "Clean document, nothing sensitive.",
                "bob@ex.io from 10.1.2.3 dialed +1-555-010-9999.",
            ],
        )
    )
    got = {r["doc_id"]: r for r in df.collect()}
    assert (got[0]["n_email"], got[0]["n_phone"], got[0]["n_ipv4"]) == (1, 0, 0)
    assert got[0]["text_redacted"] == "Mail me at <EMAIL> please."
    assert got[1]["n_phone"] == 2
    assert got[1]["text_redacted"] == "Call <PHONE> or <PHONE> now."
    assert got[2]["n_ipv4"] == 2
    assert got[2]["text_redacted"] == "Hosts <IP> and <IP> are up."
    assert got[3]["has_pii"] is False
    assert got[3]["text_redacted"] == got[3]["text"]
    assert (got[4]["n_email"], got[4]["n_phone"], got[4]["n_ipv4"]) == (1, 1, 1)
    assert got[4]["text_redacted"] == "<EMAIL> from <IP> dialed <PHONE>."


def test_pii_email_host_not_double_counted(spark):
    # the email's host part must not additionally fire the ipv4/phone
    # patterns after redaction (sentinels contain no digits)
    df = with_pii(_rows(spark, ["x user@mail.example.com y"]))
    r = df.collect()[0]
    assert (r["n_email"], r["n_ipv4"]) == (1, 0)
    assert "<EMAIL>" in r["text_redacted"] and "<IP>" not in r["text_redacted"]


def test_pii_patterns_are_re2_safe():
    # the SQL oracle applies the identical pattern text in DuckDB (RE2):
    # no lookaround / backreferences, and google-re2 if present agrees
    for _, pat, _ in PII_PATTERNS:
        assert "(?<" not in pat and "(?=" not in pat and "\\1" not in pat


def test_pii_is_codegen_only(spark):
    # pure projection: no exchange, no python in the plan
    df = with_pii(_rows(spark, ["a@b.co"]))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan
