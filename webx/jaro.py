"""Blocked Jaro-Winkler similarity join (record linkage / host & title
matching).

Levenshtein (webx/fuzzy.py) answers "how many edits apart"; Jaro-Winkler
answers "how alike do these short keys look", weighting agreeing
prefixes — the metric of the record-linkage literature (Winkler 1990,
US Census Bureau string comparator) and the standard scorer for
host/title/author linkage. The reference scores recognition quality
with an edit-distance family (mindocr/metrics/rec_metrics.py:119);
this is the same "string metric as a join predicate" recast for the
prefix-weighted variant.

Semantics are pinned to DuckDB's native ``jaro_winkler_similarity``
(the rapidfuzz formulation), established empirically and enforced by a
differential test (tests/test_jaro.py):

* computed over the UTF-8 **bytes** of the strings (DuckDB compares
  octets — ``jw('héllo','hello')`` equals the byte-level value 0.84,
  not the codepoint-level 0.88);
* match window ``max(l1,l2)//2 - 1`` (floored at 0), transpositions
  counted as ``mismatched_order_matches // 2`` (integer floor — the
  odd-mismatch case rounds DOWN, established by the ASCII
  counterexample 'zb-acc.a'/'b-z-abzx' = 0.58333…, not 0.54167…);
* Winkler boost ``+ prefix·0.1·(1-jaro)`` with prefix capped at 4
  bytes, applied only when ``jaro > 0.7`` (strict);
* either side empty → 0.0 (including both empty — DuckDB's convention).

Blocking theorem (why the join never misses a pair): with
``p = min(l1,l2)`` and ``q = max(l1,l2)`` in BYTES, the match count
``m ≤ p`` gives ``jaro ≤ (2 + p/q)/3``, and the maximal boost gives
``jw ≤ 0.6·jaro + 0.4``. Hence ``jw ≥ τ`` (τ > 0.7) forces

    p/q  ≥  3·(τ - 0.4)/0.6 - 2  =  5τ - 4.

Keys are banded by ``floor(log(octet_length) / log(1/r))`` with
``r = 5τ - 4``: any pair within byte-length ratio r sits in the same
or adjacent band, so an equi-join on (band, band+1) is a COMPLETE
candidate generator. Candidates pass the exact ratio filter, then the
byte-level scorer. The DuckDB oracle for ``q_jw_join`` is the NAIVE
all-pairs join with the native function and NO prune — equality
re-proves the band/ratio completeness theorem on real keys every
driver run.

Scale shape: this operator is for DIMENSION-sized key sets (distinct
hosts, titles, author strings after exact-collapse — the
exact-dedup-before-near-dup discipline of webx/dedup.py). Unlike edit
distance, JW admits no deletion-neighborhood exact blocking; the
length theorem is its only exact filter, so within-band candidate
counts are quadratic in band occupancy. One hash shuffle on the band
key (AQE-skew-splittable), one Arrow-batched verify over candidates
only; no Python touches the corpus.
"""

from __future__ import annotations

import math
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F


def jaro_winkler_bytes(s1: bytes, s2: bytes, prefix_weight: float = 0.1) -> float:
    """Reference scalar — DuckDB-equivalent Jaro-Winkler over bytes."""
    l1, l2 = len(s1), len(s2)
    if l1 == 0 or l2 == 0:
        return 0.0
    window = max(l1, l2) // 2 - 1
    if window < 0:
        window = 0
    match1 = bytearray(l1)
    match2 = bytearray(l2)
    m = 0
    for i in range(l1):
        c = s1[i]
        lo = i - window
        if lo < 0:
            lo = 0
        hi = i + window + 1
        if hi > l2:
            hi = l2
        for j in range(lo, hi):
            if not match2[j] and s2[j] == c:
                match1[i] = 1
                match2[j] = 1
                m += 1
                break
    if m == 0:
        return 0.0
    half_transposed = 0
    j = 0
    for i in range(l1):
        if match1[i]:
            while not match2[j]:
                j += 1
            if s1[i] != s2[j]:
                half_transposed += 1
            j += 1
    t = half_transposed // 2
    jaro = (m / l1 + m / l2 + (m - t) / m) / 3.0
    if jaro > 0.7:
        prefix = 0
        for a, b in zip(s1[:4], s2[:4]):
            if a != b:
                break
            prefix += 1
        jaro += prefix * prefix_weight * (1.0 - jaro)
    return jaro


def jw_self_pairs(
    keys: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float,
) -> DataFrame:
    """All pairs of rows with jaro_winkler(bytes(a), bytes(b)) ≥
    ``threshold`` → (id_a, id_b, jw), id_a < id_b. ``threshold`` must
    exceed 0.8 so the length-ratio prune ``r = 5τ - 4`` is non-trivial
    (below that the operator would be an honest cross join — refuse it)."""
    if threshold <= 0.8:
        raise ValueError("jw_self_pairs needs threshold > 0.8 (r = 5t - 4 <= 0)")
    r = 5.0 * threshold - 4.0
    inv_log = 1.0 / math.log(1.0 / r)
    base = keys.select(
        F.col(id_col).alias("id"),
        F.col(text_col).alias("s"),
        F.octet_length(text_col).alias("blen"),
    ).filter(F.col("blen") > 0)
    band = F.floor(F.log(F.col("blen").cast("double")) * F.lit(inv_log))
    a = base.select(
        F.col("id").alias("id_a"),
        F.col("s").alias("s_a"),
        F.col("blen").alias("len_a"),
        F.explode(F.array(band, band + 1)).alias("band"),
    )
    b = base.select(
        F.col("id").alias("id_b"),
        F.col("s").alias("s_b"),
        F.col("blen").alias("len_b"),
        band.alias("band"),
    )
    cand = (
        a.join(b, "band")
        .filter(F.col("id_a") != F.col("id_b"))
        .select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
            F.when(F.col("id_a") < F.col("id_b"), F.col("s_a")).otherwise(F.col("s_b")).alias("s_a"),
            F.when(F.col("id_a") < F.col("id_b"), F.col("s_b")).otherwise(F.col("s_a")).alias("s_b"),
            "len_a",
            "len_b",
        )
        .filter(
            F.least("len_a", "len_b").cast("double")
            >= F.lit(r) * F.greatest("len_a", "len_b").cast("double")
        )
        .drop("len_a", "len_b")
        .distinct()
    )

    # spread the Python scorer evenly: candidate counts are band-skewed
    # (popular lengths), and the distinct's hash partitioning inherits
    # that skew — one cheap round-robin exchange of the small candidate
    # frame keeps every scorer task equally loaded
    sc = keys.sparkSession.sparkContext
    cand = cand.repartition(sc.defaultParallelism)

    out_schema = "id_a long, id_b long, jw double"

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            jw = [
                jaro_winkler_bytes(x.encode("utf-8"), y.encode("utf-8"))
                for x, y in zip(pdf["s_a"], pdf["s_b"])
            ]
            out = pd.DataFrame(
                {"id_a": pdf["id_a"], "id_b": pdf["id_b"], "jw": jw}
            )
            yield out[out["jw"] >= threshold]

    return cand.mapInPandas(score, out_schema)
