"""Driver contract for the spark-graft builder (PySpark target).

Every query runs the real webx pipeline (or one of its companion
training-data operators) against deterministic inputs derived from the
driver's parquet tables; every oracle recomputes the *expected* result
independently in DuckDB SQL (generate-input-from-expected-output, the
reference's tests/st/test_online_infer.py trick — see webx/synth.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from webx import synth
from webx.config import ExtractConfig
from webx.dedup import exact_dedup, minhash_neardup, simhash_neardup
from webx.pipeline import explode_spans, run_detect, run_extraction
from webx.similarity import cosine_topk, lsh_topk
from webx.textstats import fingerprint, lang_id, quality_score, token_count

CFG = ExtractConfig()

# ---------------------------------------------------------------- SQL bits
_C = synth.template_constants()
NL = "chr(10)"
NORM = "trim(regexp_replace(text, '[ \\t\\r\\n\\f\\x0B]+', ' ', 'g'))"
DID = "('Doc ' || CAST(doc_id AS VARCHAR))"
URL = (
    "('https://h' || CAST(doc_id % 7 AS VARCHAR) || '.example.com/doc/' "
    "|| CAST(doc_id AS VARCHAR))"
)
ESC = (
    f"replace(replace(replace({NORM}, '&', '&amp;'), '<', '&lt;'), '>', '&gt;')"
)
GOLDEN = f"({DID} || {NL} || {NORM})"
WS_SPLIT_SQL = "'[ \\t\\r\\n]+'"
STOP_SQL = "['the','a','an','and','of','in','to','is','for','on']"


# ---------------------------------------------------------------- queries

def _pages(spark, sf):  # flagship pages
    return synth.synth_pages(spark, sf)


def q_extract(spark: SparkSession, sf: str) -> DataFrame:
    return run_extraction(_pages(spark, sf), CFG).select("url", "text")


def q_extract_multispan(spark: SparkSession, sf: str) -> DataFrame:
    return run_extraction(synth.synth_pages_multi(spark, sf), CFG).select("url", "text")


def q_extract_entities(spark: SparkSession, sf: str) -> DataFrame:
    return run_extraction(synth.synth_pages_entities(spark, sf), CFG).select("url", "text")


def q_extract_latin1(spark: SparkSession, sf: str) -> DataFrame:
    return run_extraction(synth.synth_pages_latin1(spark, sf), CFG).select("url", "text")


def q_extract_filter_empty(spark: SparkSession, sf: str) -> DataFrame:
    out = run_extraction(synth.synth_pages_edge(spark, sf), CFG)
    return out.filter(F.size("spans") > 0).select("url", "text")


def q_spans_stats(spark: SparkSession, sf: str) -> DataFrame:
    out = run_detect(synth.synth_pages_edge(spark, sf), CFG)
    return out.select("url", F.size("spans").alias("n_spans"))


def q_golden_spans(spark: SparkSession, sf: str) -> DataFrame:
    """Byte-exact span offsets — the strongest detector check."""
    ex = run_extraction(_pages(spark, sf), CFG)
    return explode_spans(ex).select("url", "span_idx", "start", "end", "kind")


def q_rec_metric(spark: SparkSession, sf: str) -> DataFrame:
    """RecMetric analog (mindocr/metrics/rec_metrics.py:62-151): exact-match
    count vs golden + total edit distance vs the raw teacher text."""
    pages = _pages(spark, sf).withColumnRenamed("text", "teacher")
    out = run_extraction(pages, CFG, passthrough=("teacher",))
    did = F.concat(F.lit("Doc "), F.regexp_extract("url", r"/doc/(\d+)$", 1))
    norm = F.trim(F.regexp_replace("teacher", synth.WS_CLASS, " "))
    return out.agg(
        F.count("*").alias("n_docs"),
        F.sum(
            (F.col("text") == F.concat(did, F.lit("\n"), norm)).cast("long")
        ).alias("n_correct"),
        F.sum(F.levenshtein("text", "teacher")).alias("sum_edit"),
    )


def q_lang_rollup(spark: SparkSession, sf: str) -> DataFrame:
    out = run_extraction(_pages(spark, sf), CFG, passthrough=("lang",))
    return out.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.length("text")).alias("sum_chars"),
    )


def q_topk_spans(spark: SparkSession, sf: str) -> DataFrame:
    """Window/top-k: longest span per doc (rank by decoded length)."""
    from pyspark.sql import Window

    ex = run_extraction(synth.synth_pages_multi(spark, sf), CFG)
    spans = explode_spans(ex)
    w = Window.partitionBy("url").orderBy(
        F.desc(F.length("span_text")), F.asc("start")
    )
    return (
        spans.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("url", F.col("span_text").alias("top_text"), F.length("span_text").alias("top_len"))
    )


def q_token_count(spark: SparkSession, sf: str) -> DataFrame:
    return token_count(synth.load_documents(spark, sf))


def q_quality(spark: SparkSession, sf: str) -> DataFrame:
    return quality_score(synth.load_documents(spark, sf))


def q_langid(spark: SparkSession, sf: str) -> DataFrame:
    return lang_id(synth.load_documents(spark, sf))


def q_fingerprint(spark: SparkSession, sf: str) -> DataFrame:
    return fingerprint(synth.load_documents(spark, sf))


def q_dedup_exact(spark: SparkSession, sf: str) -> DataFrame:
    return exact_dedup(synth.load_documents(spark, sf))


def _docs_with_neardups(spark: SparkSession, sf: str) -> DataFrame:
    """documents ∪ planted near-duplicates (last word dropped) for doc_id<20."""
    docs = synth.load_documents(spark, sf).select("doc_id", "text")
    planted = docs.filter(F.col("doc_id") < 20).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.regexp_replace("text", r"\s+\S+$", "").alias("text"),
    )
    return docs.unionByName(planted)


def q_dedup_minhash(spark: SparkSession, sf: str) -> DataFrame:
    docs = _docs_with_neardups(spark, sf)
    return minhash_neardup(docs, threshold=0.6).select("id_a", "id_b").orderBy("id_a", "id_b")


def q_dedup_simhash(spark: SparkSession, sf: str) -> DataFrame:
    docs = _docs_with_neardups(spark, sf)
    return simhash_neardup(docs, max_hamming=3).select("id_a", "id_b").orderBy("id_a", "id_b")


def _emb(spark, sf):
    return spark.read.parquet(f"{sf}/embeddings.parquet")


def q_ann_cosine(spark: SparkSession, sf: str) -> DataFrame:
    emb = _emb(spark, sf)
    queries = emb.filter(F.col("vec_id") < 8)
    return cosine_topk(emb, queries, k=5).select("query_id", "rank", "neighbor_id")


def q_ann_lsh(spark: SparkSession, sf: str) -> DataFrame:
    emb = _emb(spark, sf)
    dim = len(emb.select("embedding").first()[0])
    queries = emb.filter(F.col("vec_id") < 8)
    return lsh_topk(emb, queries, dim=dim, k=5).select("query_id", "rank", "neighbor_id")


def q_events_window(spark: SparkSession, sf: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf}/events.parquet")
    return ev.groupBy(
        F.date_trunc("hour", "ts").alias("window_start"),
        "event_type",
    ).agg(
        F.count("*").alias("n_events"),
        F.sum(F.floor(F.col("value") * 100).cast("long")).alias("sum_cents"),
    )


def q_media_meta(spark: SparkSession, sf: str) -> DataFrame:
    pages = _pages(spark, sf)
    return pages.select(
        "url",
        F.octet_length("html").alias("n_bytes"),
        (F.decode(F.substring("html", 1, 9), "UTF-8") == "<!DOCTYPE").alias("is_html"),
    )


# ---------------------------------------------------------------- contract

def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_extract(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "q_extract": q_extract,
        "q_extract_multispan": q_extract_multispan,
        "q_extract_entities": q_extract_entities,
        "q_extract_latin1": q_extract_latin1,
        "q_extract_filter_empty": q_extract_filter_empty,
        "q_spans_stats": q_spans_stats,
        "q_golden_spans": q_golden_spans,
        "q_rec_metric": q_rec_metric,
        "q_lang_rollup": q_lang_rollup,
        "q_topk_spans": q_topk_spans,
        "q_token_count": q_token_count,
        "q_quality": q_quality,
        "q_langid": q_langid,
        "q_fingerprint": q_fingerprint,
        "q_dedup_exact": q_dedup_exact,
        "q_dedup_minhash": q_dedup_minhash,
        "q_dedup_simhash": q_dedup_simhash,
        "q_ann_cosine": q_ann_cosine,
        "q_ann_lsh": q_ann_lsh,
        "q_events_window": q_events_window,
        "q_media_meta": q_media_meta,
    }


def oracle_sql() -> dict[str, str]:
    c = _C
    span_start = f"{c['head_utf8']} + length({DID}) + {c['chrome']}"
    esc_len = f"length({ESC})"
    return {
        "q_extract": f"SELECT {URL} AS url, {GOLDEN} AS text FROM documents",
        "q_extract_multispan": (
            f"SELECT {URL} AS url, "
            f"({DID} || {NL} || {NORM} || {NL} || 'Notes' || {NL} || upper({NORM})) AS text "
            "FROM documents"
        ),
        "q_extract_entities": (
            f"SELECT {URL} AS url, "
            f"({DID} || {NL} || 'Fish & chips <tag> AB ' || chr(8230) || ' ' || {NORM}) AS text "
            "FROM documents"
        ),
        "q_extract_latin1": (
            f"SELECT {URL} AS url, "
            f"({DID} || {NL} || {NORM} || ' caf' || chr(233)) AS text FROM documents"
        ),
        "q_extract_filter_empty": (
            f"SELECT {URL} AS url, {GOLDEN} AS text FROM documents WHERE doc_id % 5 <> 0"
        ),
        "q_spans_stats": (
            f"SELECT {URL} AS url, (CASE WHEN doc_id % 5 = 0 THEN 0 ELSE 1 END) AS n_spans "
            "FROM documents"
        ),
        "q_golden_spans": (
            f"SELECT {URL} AS url, 0 AS span_idx, "
            f"CAST({span_start} AS BIGINT) AS start, "
            f"CAST({span_start} + length({DID}) + {c['mid']} + {esc_len} AS BIGINT) AS \"end\", "
            "'content' AS kind FROM documents"
        ),
        "q_rec_metric": (
            "SELECT COUNT(*) AS n_docs, COUNT(*) AS n_correct, "
            f"SUM(levenshtein({GOLDEN}, text)) AS sum_edit FROM documents"
        ),
        "q_lang_rollup": (
            f"SELECT lang, COUNT(*) AS n_docs, SUM(length({GOLDEN})) AS sum_chars "
            "FROM documents GROUP BY lang"
        ),
        "q_topk_spans": (
            f"SELECT {URL} AS url, ({DID} || {NL} || {NORM}) AS top_text, "
            f"length({DID} || {NL} || {NORM}) AS top_len FROM documents"
        ),
        "q_token_count": (
            f"SELECT doc_id, CAST(len(regexp_split_to_array(trim(text), {WS_SPLIT_SQL})) AS INT) "
            "AS n_tokens FROM documents"
        ),
        "q_quality": (
            "SELECT doc_id, CAST(length(text) AS INT) AS n_chars, "
            f"CAST(len(regexp_split_to_array(trim(text), {WS_SPLIT_SQL})) AS INT) AS n_tokens, "
            f"CAST(len(list_filter(regexp_split_to_array(trim(text), {WS_SPLIT_SQL}), "
            f"w -> list_contains({STOP_SQL}, lower(w)))) AS INT) AS n_stopwords, "
            "CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS INT) "
            "AS n_punct FROM documents"
        ),
        "q_langid": (
            "SELECT doc_id, (CASE WHEN "
            "(length(' ' || lower(text) || ' ') - length(replace(' ' || lower(text) || ' ', ' the ', ''))) / 5 >= 1 "
            "THEN 'en' ELSE 'und' END) AS pred_lang FROM documents"
        ),
        "q_fingerprint": (
            "SELECT doc_id, md5(trim(regexp_replace(lower(text), '[ \\t\\r\\n]+', ' ', 'g'))) "
            "AS fp FROM documents"
        ),
        "q_dedup_exact": (
            "SELECT md5(text) AS fp, COUNT(*) AS n_dups, MIN(doc_id) AS min_doc_id "
            "FROM documents GROUP BY md5(text)"
        ),
        "q_ann_cosine": (
            "WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 8), "
            "s AS (SELECT q.qid AS query_id, c.vec_id AS neighbor_id, "
            "list_cosine_similarity(q.qe, c.embedding) AS cos "
            "FROM q, embeddings c WHERE c.vec_id <> q.qid) "
            "SELECT query_id, rank, neighbor_id FROM ("
            "SELECT query_id, neighbor_id, CAST(row_number() OVER "
            "(PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS INT) AS rank FROM s) "
            "WHERE rank <= 5"
        ),
        "q_events_window": (
            "SELECT date_trunc('hour', ts) AS window_start, event_type, "
            "COUNT(*) AS n_events, SUM(CAST(floor(value * 100) AS BIGINT)) AS sum_cents "
            "FROM events GROUP BY 1, 2"
        ),
        "q_media_meta": (
            f"SELECT {URL} AS url, "
            f"CAST({c['head_utf8']} + 2 * length({DID}) + {c['chrome']} + {c['mid']} "
            f"+ {esc_len} + {c['tail_bytes']} AS INT) AS n_bytes, TRUE AS is_html "
            "FROM documents"
        ),
        # q_dedup_minhash / q_dedup_simhash / q_ann_lsh: hash-algorithm-
        # specific (xxhash64) / approximate — rows-only checks by design.
    }
