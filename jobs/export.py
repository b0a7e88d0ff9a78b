#!/usr/bin/env python3
"""spark-submit entry point for the training-data export — the last
step of the curation funnel: a DETERMINISTIC global shuffle of the
curated corpus into N sorted shards, written shard-at-a-time with a
manifest, resumable at shard granularity.

Why not ``orderBy(rand()).repartition(N)``: a training export must be
reproducible (same corpus → byte-wise the same shard contents in the
same order, on any cluster size, on a re-run after a mid-export
failure) and mix correlated inputs (a host's pages arrive adjacent in
crawl order; they must not land adjacent in training order).
``corpus_shard``'s hash discipline (webx/sampling.py) gives both:
shard = low hash bits, within-shard order = unsigned-hash order — a
pure function of the document key.

Resume: the manifest records every completed shard with its row count
and content fingerprint. A re-run (same --output) skips completed
shards and writes only the missing ones; because shard contents are a
deterministic function of the input, the resumed export is
row-identical to a never-interrupted one (tests/test_export_job.py
kills the job between shards and proves equality).

Reference analogy: mindocr's save_res / per-stage sinks write one
result file per evaluated split (mindocr/tools/infer/text/predict_*);
here the sink is the sharded training corpus itself, with the
reference's checkpoint-resume training loop recast as shard-granular
export resume.

Usage (cluster):
    spark-submit --py-files webx.zip jobs/export.py \
        --input s3://…/curated --output s3://…/export \
        --n-shards 1024 --key-col url

Usage (sandbox smoke):
    python3 jobs/export.py --synth /root/testdata/sf0.001 \
        --output /tmp/export --n-shards 8
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def parse_args(argv):
    p = argparse.ArgumentParser(description="webx deterministic training export")
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--input", help="curated-docs parquet")
    src.add_argument("--synth", help="synthesize docs from this testdata sf dir")
    p.add_argument("--output", required=True)
    p.add_argument("--n-shards", type=int, default=16,
                   help="power of two; becomes shard=NNNN/ dirs")
    p.add_argument("--key-col", default="doc_id",
                   help="stable document key the shuffle hashes")
    p.add_argument("--max-shards-per-run", type=int, default=None,
                   help="write at most this many missing shards then exit 0 "
                        "(failure-injection / incremental-budget knob)")
    return p.parse_args(argv)


def _manifest_path(output: str) -> str:
    return os.path.join(output, "_manifest.json")


def read_manifest(output: str) -> dict:
    path = _manifest_path(output)
    if os.path.exists(path):
        with open(path) as fh:
            return json.load(fh)
    return {"shards": {}}


def write_manifest(output: str, manifest: dict) -> None:
    # atomic replace: a killed run never leaves a torn manifest
    path = _manifest_path(output)
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(manifest, fh, indent=1, sort_keys=True)
    os.replace(tmp, path)


def main(argv=None) -> int:
    args = parse_args(argv if argv is not None else sys.argv[1:])
    if args.n_shards & (args.n_shards - 1) or args.n_shards <= 0:
        print("--n-shards must be a power of two", file=sys.stderr)
        return 2

    from pyspark.sql import SparkSession

    from webx import synth

    spark = (
        SparkSession.builder.appName("webx-export")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    if args.synth:
        docs = synth.load_documents(spark, args.synth)
    else:
        docs = spark.read.parquet(args.input)
    key = args.key_col
    if key not in docs.columns:
        print(f"key column {key!r} not in input", file=sys.stderr)
        return 2

    os.makedirs(args.output, exist_ok=True)
    manifest = read_manifest(args.output)
    done = set(manifest["shards"])
    missing = [s for s in range(args.n_shards) if str(s) not in done]
    if args.max_shards_per_run is not None:
        missing = missing[: args.max_shards_per_run]
    if not missing:
        print(json.dumps({"export": "complete", "shards": len(done)}))
        return 0

    # torn-write cleanup: a run killed AFTER the parquet write but
    # BEFORE the manifest update leaves shard dirs on disk that the
    # manifest doesn't vouch for — appending to them would duplicate
    # rows, so they are rewritten from scratch
    import shutil

    data_dir = os.path.join(args.output, "data")
    for s in missing:
        torn = os.path.join(data_dir, f"shard={s}")
        if os.path.exists(torn):
            shutil.rmtree(torn)

    h = F.xxhash64(F.col(key))
    shard = h.bitwiseAND(F.lit(args.n_shards - 1)).cast("int")
    okey = h.bitwiseXOR(F.lit(-(1 << 63)))  # unsigned-order sort key
    staged = docs.withColumn("shard", shard).withColumn("_okey", okey)
    if len(missing) < args.n_shards:
        staged = staged.filter(F.col("shard").isin(missing))

    # ONE exchange on shard, per-shard sort inside each writer task,
    # one directory per shard — the writer-plan shape corpus_shard's
    # gated query asserts. Shards not in `missing` are untouched
    # (resume appends only new shard=NNNN/ dirs).
    (
        staged.repartition(len(missing), "shard")
        .sortWithinPartitions("shard", "_okey", key)
        .drop("_okey")
        .write.mode("append")
        .partitionBy("shard")
        .parquet(os.path.join(args.output, "data"))
    )

    # per-shard lineage: row count + content fingerprint (bit_xor of the
    # key hashes — commutative, overflow-free under ANSI; within-shard
    # ORDER needs no fingerprint because it is a pure function of the
    # content), ONE aggregate job over what was written
    written = spark.read.parquet(os.path.join(args.output, "data")).filter(
        F.col("shard").isin(missing)
    )
    fp = written.groupBy("shard").agg(
        F.count("*").alias("n_docs"),
        F.expr(f"bit_xor(xxhash64({key}))").alias("content_fp"),
    )
    for row in fp.collect():  # ≤ n_shards rows — driver-scalar scale
        manifest["shards"][str(row["shard"])] = {
            "n_docs": int(row["n_docs"]),
            "content_fp": int(row["content_fp"]),
        }
    write_manifest(args.output, manifest)
    print(
        json.dumps(
            {
                "export": "partial" if len(manifest["shards"]) < args.n_shards
                else "complete",
                "wrote_shards": len(missing),
                "total_done": len(manifest["shards"]),
                "n_shards": args.n_shards,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
