"""Format converters → the canonical tables.

The reference ships per-dataset converters behind one dispatch
(tools/dataset_converters/convert.py:31-50: named registry, canonical
`img_path\\t[{...}]` output, ValueError listing supported names). The
webtext recast: external corpus/label formats convert into the two
canonical schemas — ``pages`` (url, warc_ts, html) and golden span
labels (url, spans) — as fully distributed reads, so any downstream
query runs unchanged on converted data.

Supported formats:
* ``jsonl_pages`` — JSON-lines {url, ts, html_b64} crawls (the common
  dump interchange shape); base64 html decoded JVM-side.
* ``csv_docs``    — CSV (doc_id, lang, text) document dumps.
* ``det_labels``  — the reference's detection label format recast:
  ``url\\tJSON-span-array`` text lines → (url, spans) golden tables
  (convert.py emits exactly this `path\\t[{...}]` shape).
* ``warc``        — Common-Crawl WARC archives (webx.sources.read_warc).
* ``keyed_store`` — key-addressed binary shards
  (webx.sources.read_keyed_store).
* ``bulk_arrays`` — one columnar container holding PARALLEL ARRAYS per
  shard row (names[], texts[]) — the SynthTextDataset analog (reference
  mindocr/data/det_dataset.py:155-165: one ``gt.mat``, parallel
  ``imnames``/``wordBB``/``txt`` arrays zipped into per-sample records).
  ``arrays_zip`` + ``posexplode`` recover per-sample rows with the
  container's global (shard, index) order — all JVM, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

SPAN_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("start", T.LongType()),
            T.StructField("end", T.LongType()),
            T.StructField("kind", T.StringType()),
        ]
    )
)


def _jsonl_pages(spark: SparkSession, path: str) -> DataFrame:
    df = spark.read.json(path)
    return df.select(
        F.col("url"),
        F.col("ts").cast("timestamp").alias("warc_ts"),
        F.unbase64("html_b64").alias("html"),
    )


def _csv_docs(spark: SparkSession, path: str) -> DataFrame:
    df = spark.read.option("header", "true").csv(path)
    return df.select(
        F.col("doc_id").cast("long"),
        F.col("lang"),
        F.col("text"),
    )


def read_url_tsv(spark: SparkSession, path: str, value_alias: str) -> DataFrame:
    """``url\\t<value>`` text lines → (url, <value_alias>). A line
    without the tab separator is corrupt label data — fail the job
    loudly (the reference converters raise on malformed input) rather
    than emitting empty-url rows that silently poison downstream url
    joins. Shared by the det_labels converter and jobs/evaluate.py."""
    lines = spark.read.text(path)
    tab = F.instr("value", "\t")
    url = F.when(tab > 0, F.substring("value", 1, tab - 1)).otherwise(
        F.raise_error(
            F.concat(F.lit("url-tsv: malformed line (no tab): "), F.col("value"))
        )
    )
    return lines.select(
        url.alias("url"),
        F.expr("substring(value, instr(value, '\t') + 1)").alias(value_alias),
    )


def _det_labels(spark: SparkSession, path: str) -> DataFrame:
    raw = read_url_tsv(spark, path, "spans_json")
    return raw.select(
        "url", F.from_json("spans_json", SPAN_SCHEMA).alias("spans")
    )


def _warc(spark: SparkSession, path: str) -> DataFrame:
    from webx.sources import read_warc

    return read_warc(spark, path)


def _keyed_store(spark: SparkSession, path: str) -> DataFrame:
    from webx.sources import read_keyed_store

    return read_keyed_store(spark, path)


def _bulk_arrays(spark: SparkSession, path: str) -> DataFrame:
    """Parallel-array shard rows → per-sample rows.

    Input schema: (shard_id, names array<string>, texts array<string>)
    with names[i] ↔ texts[i] (the loadmat-zip contract,
    det_dataset.py:160). A shard whose arrays disagree in length is
    corrupt label data: ``arrays_zip`` would silently NULL-pad, so the
    length check raises loudly instead (the reference converters'
    malformed-input contract). Output: (shard_id, idx, name, text),
    idx = position within the shard — (shard_id, idx) IS the
    container's global sample order."""
    df = spark.read.parquet(path)
    ok = F.size("names") == F.size("texts")
    checked = df.select(
        "shard_id",
        F.when(ok, F.arrays_zip("names", "texts")).otherwise(
            F.raise_error(
                F.concat(
                    F.lit("bulk_arrays: parallel arrays disagree in shard "),
                    F.col("shard_id").cast("string"),
                )
            )
        ).alias("z"),
    )
    return checked.select(
        "shard_id", F.posexplode("z").alias("idx", "s")
    ).select(
        "shard_id",
        "idx",
        F.col("s.names").alias("name"),
        F.col("s.texts").alias("text"),
    )


CONVERTERS = {
    "jsonl_pages": _jsonl_pages,
    "csv_docs": _csv_docs,
    "det_labels": _det_labels,
    "warc": _warc,
    "keyed_store": _keyed_store,
    "bulk_arrays": _bulk_arrays,
}


def convert(spark: SparkSession, dataset_format: str, path: str) -> DataFrame:
    """Dispatch like the reference's ``convert(dataset_name, ...)`` —
    unknown names raise with the supported list."""
    if dataset_format not in CONVERTERS:
        raise ValueError(
            f"{dataset_format!r} is not supported for conversion, "
            f"supported formats are {sorted(CONVERTERS)}"
        )
    return CONVERTERS[dataset_format](spark, path)
