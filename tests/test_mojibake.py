"""Mojibake detection + repair (webx/textstats.py): signature counts,
round-trip repair restores the original bytes, repair never destroys
text it cannot fix, double-mojibake needs two rounds."""

from __future__ import annotations

from pyspark.sql import functions as F

from webx.textstats import MOJIBAKE_SIGS, mojibake_repair, mojibake_stats

# every UTF-8 byte of this string is defined in cp1252 (0x9D — the
# closing ” — is not, which is why it's absent: that corruption is
# unrecoverable by round-trip and belongs in the never-destroys test)
ORIG = "He said “don’t — café, naïve… °C «quoted»"
MOJI = ORIG.encode("utf-8").decode("cp1252")
# the em dash's first-level corruption contains ” (0x94→U+201D) whose
# UTF-8 holds 0x9D — undefined in cp1252 — so — cannot double-corrupt;
# the double round-trip is tested on a string that can
ORIG2 = "café naïve…"
DOUBLE = ORIG2.encode("utf-8").decode("cp1252").encode("utf-8").decode("cp1252")


def test_stats_counts_signatures(spark):
    docs = spark.createDataFrame(
        [(0, ORIG), (1, MOJI), (2, "plain ascii only")], ["doc_id", "text"]
    )
    got = {r["doc_id"]: (r["n_moji"], r["moji"]) for r in mojibake_stats(docs).collect()}
    assert got[0] == (0, False)  # genuine smart punctuation is NOT flagged
    assert got[2] == (0, False)
    n, flag = got[1]
    assert flag and n >= 6  # “ ’ — … ° « » é ï signatures present


def test_repair_roundtrip_exact(spark):
    docs = spark.createDataFrame(
        [(0, MOJI), (1, "clean text stays"), (2, DOUBLE)], ["doc_id", "text"]
    )
    got = {r["doc_id"]: (r["text"], r["repaired"]) for r in mojibake_repair(docs).collect()}
    assert got[0] == (ORIG, True)
    assert got[1] == ("clean text stays", False)
    assert got[2] == (ORIG2, True)  # two rounds undo double-encoding


def test_repair_never_destroys_unfixable(spark):
    # contains a signature AND a char outside cp1252 -> encode fails ->
    # text must come back untouched
    tricky = "Ã© plus CJK 漢字 in one doc"
    docs = spark.createDataFrame([(0, tricky)], ["doc_id", "text"])
    row = mojibake_repair(docs).first()
    assert row["text"] == tricky and row["repaired"] is False


def test_signatures_are_their_own_corruptions():
    # every signature is the cp1252 reading of a real UTF-8 sequence,
    # so one repair round strictly shrinks it
    for sig in MOJIBAKE_SIGS:
        orig = sig.encode("cp1252").decode("utf-8")
        assert len(orig) < len(sig), (sig, orig)
