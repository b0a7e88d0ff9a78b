"""Multimodal columns: image/audio/video as opaque ``binary`` payloads with
typed metadata, processed by Arrow-batched ``mapInPandas`` ops.

The Spark-side plumbing — schema, batch shape, UDF signatures, partition
behavior — is real and tested; the *codec* step is stubbed because no
image/audio library ships in this container: every op here ALWAYS runs
the clearly-marked DETERMINISTIC FAKE codec (pure byte arithmetic) so the
pipeline stays oracle-checkable end-to-end. ``_HAVE_PIL`` below only
*detects* an optional real codec — it is the documented slot-in point for
a real JPEG/PNG decode inside ``decode_image_bytes``, not a switch that
is consulted today.

This mirrors how the reference treats images as opaque bytes until
``DecodeImage`` materializes them (mindocr/data/transforms/
general_transforms.py:17-53) and batches them through a fixed-schema
pipeline (mindocr/data/builder.py:154-161).
"""

from __future__ import annotations

from typing import Iterable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                    T.StructField("n_frames", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("byte_sum", T.LongType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)


def synth_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fake media table derived from the documents table:
    payload bytes = utf-8 of the doc text repeated (kind-dependent), meta
    derived from doc_id arithmetic. JVM-side synthesis only."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    kind = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    payload = F.encode(F.concat(F.col("text"), F.lit("|"), F.col("text")), "UTF-8")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        payload.alias("payload"),
        F.struct(
            F.concat(F.lit("x-fake/"), kind).alias("mime"),
            (64 + F.col("doc_id") % 193).cast("int").alias("width"),
            (48 + F.col("doc_id") % 129).cast("int").alias("height"),
            F.lit(16000).cast("int").alias("sample_rate"),
            (1 + F.col("doc_id") % 7).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def _features_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """DETERMINISTIC FAKE decode: per-payload byte statistics standing in
    for pixel/sample decoding. Real plumbing: binary → numpy → features."""
    out = {"media_id": [], "kind": [], "n_bytes": [], "byte_sum": [], "feature": []}
    for mid, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
        buf = np.frombuffer(bytes(payload) if payload is not None else b"", dtype=np.uint8)
        n = int(buf.size)
        s = int(buf.sum()) if n else 0
        # 8-bin byte histogram, normalized — the "embedding" of the fake codec
        hist = np.bincount(buf >> 5, minlength=8).astype(np.float64) if n else np.zeros(8)
        feat = (hist / max(n, 1)).tolist()
        out["media_id"].append(mid)
        out["kind"].append(kind)
        out["n_bytes"].append(n)
        out["byte_sum"].append(s)
        out["feature"].append(feat)
    return pd.DataFrame(out)


def media_features(media: DataFrame) -> DataFrame:
    """(media_id, kind, n_bytes, byte_sum, feature[8]) via mapInPandas."""

    def fn(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _features_batch(pdf)

    return media.select("media_id", "kind", "payload").mapInPandas(
        fn, schema=FEATURES_SCHEMA
    )


# ---------------------------------------------------------------- codec stubs

try:  # pragma: no cover - library not present in this container
    from PIL import Image  # noqa: F401

    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False


def decode_image_bytes(payload: bytes, width: int, height: int) -> np.ndarray:
    """FAKE codec: interpret raw payload bytes as a row-major grayscale
    ``height×width`` grid (truncate / zero-pad). A real JPEG/PNG decode
    slots in here when a codec lib exists (gated below); everything
    downstream (resample, schema, batching) is format-agnostic."""
    need = width * height
    buf = np.frombuffer(payload or b"", dtype=np.uint8)[:need]
    if buf.size < need:
        buf = np.concatenate([buf, np.zeros(need - buf.size, dtype=np.uint8)])
    return buf.reshape(height, width)


def resize_image(media: DataFrame, width: int, height: int) -> DataFrame:
    """Distributed nearest-neighbor resize over image payloads →
    (media_id, payload, meta) with the resampled grid and updated
    dimensions. The decode step uses the deterministic fake codec above
    (real formats need a codec lib — see ``_HAVE_PIL``); the resample
    itself is real vectorized numpy (index-array gather per image)."""

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField(
                "meta",
                T.StructType(
                    [
                        T.StructField("mime", T.StringType()),
                        T.StructField("width", T.IntegerType()),
                        T.StructField("height", T.IntegerType()),
                    ]
                ),
            ),
        ]
    )

    def fn(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # precomputed gather indices are shared by every image in a batch
        for pdf in batches:
            out = {"media_id": [], "payload": [], "meta": []}
            for mid, payload, w0, h0, mime in zip(
                pdf["media_id"], pdf["payload"], pdf["width"], pdf["height"], pdf["mime"]
            ):
                img = decode_image_bytes(
                    bytes(payload) if payload is not None else b"", int(w0), int(h0)
                )
                ys = (np.arange(height) * img.shape[0] // height).clip(0, img.shape[0] - 1)
                xs = (np.arange(width) * img.shape[1] // width).clip(0, img.shape[1] - 1)
                resized = img[np.ix_(ys, xs)]
                out["media_id"].append(mid)
                out["payload"].append(resized.tobytes())
                out["meta"].append({"mime": mime, "width": width, "height": height})
            yield pd.DataFrame(out)

    return (
        media.filter(F.col("kind") == "image")
        .select(
            "media_id",
            "payload",
            F.col("meta.width").alias("width"),
            F.col("meta.height").alias("height"),
            F.col("meta.mime").alias("mime"),
        )
        .mapInPandas(fn, schema=out_schema)
    )


def sample_frames(media: DataFrame, every_n: int = 2) -> DataFrame:
    """Frame sampling over the fake video payload: split payload into
    ``meta.n_frames`` equal chunks, keep every ``every_n``-th — real
    distributed slicing (pure byte arithmetic, deterministic)."""
    frames_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )

    def fn(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "frame": []}
            for mid, payload, nf in zip(
                pdf["media_id"], pdf["payload"], pdf["n_frames"]
            ):
                raw = bytes(payload) if payload is not None else b""
                nf = max(int(nf), 1)
                step = max(len(raw) // nf, 1)
                for i in range(0, nf, every_n):
                    out["media_id"].append(mid)
                    out["frame_idx"].append(i)
                    out["frame"].append(raw[i * step : (i + 1) * step])
            yield pd.DataFrame(out)

    return (
        media.filter(F.col("kind") == "video")
        .select("media_id", "payload", F.col("meta.n_frames").alias("n_frames"))
        .mapInPandas(fn, schema=frames_schema)
    )
