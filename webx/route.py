"""Mixed-corpus routed extraction — the real crawl-archive shape.

A Common-Crawl-style capture stream is NOT homogeneous: one WARC holds
HTML pages, PDFs, and images side by side. The reference pipeline picks
its decoder per input up front (mindocr/data/builder.py routes dataset
classes; general_transforms.py:35-53 decodes by buffer content); this
module is the Spark recast: ONE Arrow ``mapInPandas`` pass whose batch
function dispatches each row on its MAGIC BYTES (never the
Content-Type header — the q_mime_route policy) into the right lane:

* ``html``  → the fused two-stage extractor (webx/extract.py
  extract_batch — same code, same C kernels, byte-identical output);
* ``pdf``   → the text-PDF parser (webx/pdf.py parse_pdf, incl. the
  encrypted and xref-stream layouts), fail-soft 'unsupported';
* ``image`` → the pure-struct header sniffer (webx/media.py
  sniff_image_meta) — metadata only, text NULL;
* ``audio`` (WAV / FLAC / Ogg magic) → sniff_audio_meta → sample_rate;
* ``video`` (ISO-BMFF ftyp, non-AVIF brand) → sniff_video_meta →
  dims + duration_ms;
* anything else → kind='other', status='skipped', nothing lost. MP3 is
  deliberately NOT magic-routed here: its 11-bit frame sync is too weak
  a signature for arbitrary binary (the audio lane still parses MP3
  when a caller routes it explicitly).

The batch function slices each Arrow batch into per-kind sub-frames and
calls the EXISTING batch kernels on each slice (no per-row re-dispatch
inside a lane), then reassembles in input order — so the html slice
pays exactly the flagship's cost and the mixed pass stays one scan,
one Python stage, zero shuffles. At 100 TB this is the plan you want:
no three-way scan fan-out, no routing shuffle; lane skew (a PDF-heavy
shard) is already handled by the upstream url-hash repartition.
"""

from __future__ import annotations

from typing import Iterable, Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from webx.config import ExtractConfig

ROUTED_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("kind", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

_IMAGE_MAGICS = (b"\x89PNG\r\n\x1a\n", b"GIF87a", b"GIF89a", b"\xff\xd8", b"RIFF")


def classify_payload(b: bytes) -> str:
    """Magic-byte routing (the Python twin of webx.sources.sniff_mime's
    codegen CASE): pdf / image / audio / video / html / other."""
    if b.startswith(b"%PDF-"):
        return "pdf"
    if b.startswith(b"BM") and len(b) >= 18:
        return "image"
    if b.startswith((b"fLaC", b"OggS")):
        return "audio"
    if len(b) >= 12 and b[4:8] == b"ftyp":
        return "image" if b[8:12] in (b"avif", b"avis") else "video"
    for m in _IMAGE_MAGICS:
        if b.startswith(m):
            if m == b"RIFF":
                if len(b) >= 12 and b[8:12] == b"WEBP":
                    return "image"
                if len(b) >= 12 and b[8:12] == b"WAVE":
                    return "audio"
                continue
            return "image"
    head = b[:1024].lstrip(b" \t\r\n\f")
    low = head[:64].lower()
    if low.startswith((b"<!doctype", b"<html", b"<head", b"<body")) or head[:1] == b"<":
        return "html"
    return "other"


def _routed_batch(pdf: pd.DataFrame, cfg: ExtractConfig,
                  passthrough: tuple = ()) -> pd.DataFrame:
    from webx.extract import extract_batch
    from webx.media import sniff_image_meta
    from webx.pdf import parse_pdf

    payloads = [
        bytes(p) if p is not None else b"" for p in pdf["payload"].tolist()
    ]
    kinds = [classify_payload(p) for p in payloads]
    n = len(kinds)
    out = {
        "url": pdf["url"].tolist(),
        "kind": kinds,
        "text": [None] * n,
        "status": ["skipped"] * n,
        "width": [None] * n,
        "height": [None] * n,
        "sample_rate": [None] * n,
        "duration_ms": [None] * n,
    }

    html_idx = [i for i, k in enumerate(kinds) if k == "html"]
    if html_idx:
        sub = pd.DataFrame(
            {
                "url": [out["url"][i] for i in html_idx],
                "html": [payloads[i] for i in html_idx],
            }
        )
        res = extract_batch(sub, cfg)
        for i, text, status in zip(html_idx, res["text"], res["status"]):
            out["text"][i] = text
            out["status"][i] = status

    for i, k in enumerate(kinds):
        if k == "pdf":
            try:
                text, _spans = parse_pdf(payloads[i])
                out["text"][i], out["status"][i] = text, "ok"
            except Exception:
                out["text"][i], out["status"][i] = "", "unsupported"
        elif k == "image":
            fmt, w, h, ok = sniff_image_meta(payloads[i])
            out["width"][i], out["height"][i] = w, h
            out["status"][i] = "ok" if ok else "unsupported"
        elif k == "audio":
            from webx.media import sniff_audio_meta

            fmt, sr, ch, ok = sniff_audio_meta(payloads[i])
            out["sample_rate"][i] = sr
            out["status"][i] = "ok" if ok else "unsupported"
        elif k == "video":
            from webx.media import sniff_video_meta

            fmt, w, h, dur, ok = sniff_video_meta(payloads[i])
            out["width"][i], out["height"][i] = w, h
            out["duration_ms"][i] = dur
            out["status"][i] = "ok" if ok else "unsupported"
    res = pd.DataFrame(out)
    for c in passthrough:
        res[c] = pdf[c].to_numpy()
    return res


def extract_mixed(
    captures: DataFrame,
    cfg: Optional[ExtractConfig] = None,
    url_col: str = "url",
    payload_col: str = "payload",
    passthrough: tuple = (),
) -> DataFrame:
    """(url, payload) mixed captures → (url, kind, text, status, width,
    height, sample_rate, duration_ms): one pruned scan, one Arrow pass,
    per-row magic-byte dispatch into the existing lane kernels.
    ``passthrough`` columns ride through unchanged (the extract_pdf
    contract)."""
    cfg = cfg or ExtractConfig()
    schema = T.StructType(
        list(ROUTED_SCHEMA) + [captures.schema[c] for c in passthrough]
    )

    def fn(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _routed_batch(pdf, cfg, passthrough)

    return (
        captures.select(
            F.col(url_col).alias("url"),
            F.col(payload_col).alias("payload"),
            *passthrough,
        ).mapInPandas(fn, schema=schema)
    )


def checkpointed_routed_extract_fn(subset: DataFrame, cfg, passthrough) -> DataFrame:
    """Adapter matching webx.lineage's ``extract_fn`` contract so MIXED
    corpora get partition-granular checkpoint/resume like the HTML and
    PDF lanes: input (url, html=payload bytes, partition cols…) →
    lineage-shaped output (url, text, conf, status, spans, meta) with
    the routing columns riding along."""
    sub = subset.withColumn("__nb", F.octet_length("html"))
    routed = extract_mixed(
        sub, cfg, payload_col="html",
        passthrough=tuple(passthrough) + ("__nb",),
    )
    spans_t = "array<struct<start:bigint,end:bigint,kind:string>>"
    return routed.select(
        "url",
        F.coalesce("text", F.lit("")).alias("text"),
        F.expr(f"CAST(array() AS {spans_t})").alias("spans"),
        "status",
        F.when(F.col("status") == "ok", F.lit(1.0)).otherwise(F.lit(0.0)).alias("conf"),
        F.struct(F.col("__nb").cast("long").alias("html_bytes")).alias("meta"),
        "kind", "width", "height", "sample_rate", "duration_ms",
        *passthrough,
    )
