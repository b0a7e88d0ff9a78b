"""WET container lane: round-trip, fail-soft parse, distributed sink."""

from __future__ import annotations

import datetime as dt
import gzip

from webx.sources import parse_wet, read_wet, write_wet, write_wet_dir

TS = dt.datetime(2026, 3, 1, 12, 0, 0)
RECS = [
    ("https://a.example.com/1", TS, "Doc one\nline two"),
    ("https://b.example.com/2", TS, "Résumé — naïve façade"),  # multi-byte
    ("https://c.example.com/3", TS, ""),
]


def test_roundtrip_bytes():
    got = parse_wet(write_wet(RECS))
    assert [(u, t) for u, _, t in got] == [(u, t) for u, _, t in RECS]
    assert all(ts.replace(tzinfo=None) == TS for _, ts, _ in got)


def test_gzip_member():
    got = parse_wet(gzip.compress(write_wet(RECS)))
    assert len(got) == 3


def test_skips_warcinfo_and_garbage():
    info = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 5\r\n\r\nhello\r\n\r\n"
    )
    raw = info + write_wet(RECS[:1]) + b"trailing garbage no record"
    got = parse_wet(raw)
    assert len(got) == 1 and got[0][0] == RECS[0][0]


def test_distributed_sink_and_source(spark, tmp_path):
    df = spark.createDataFrame(
        RECS, "url string, wet_ts timestamp, text string"
    ).repartition(3)
    shards = write_wet_dir(df, str(tmp_path / "wet"))
    assert sum(n for _, n in shards) == 3
    back = read_wet(spark, str(tmp_path / "wet"))
    got = {r.url: (r.wet_ts, r.text) for r in back.collect()}
    assert got == {u: (TS, t) for u, _, t in RECS}
