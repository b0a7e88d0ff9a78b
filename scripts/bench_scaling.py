#!/usr/bin/env python3
"""Scaling-efficiency bench: the same extraction job at N and 4N cores.

The north rule requires throughput scaling efficiency >= 0.8 between N-
and 4N-executor clusters; in this sandbox the evidence is the identical
job at ``local[8]`` vs ``local[32]`` on the identical materialized input
(SURVEY.md §6). Efficiency = (docs_per_sec_4N / docs_per_sec_N) / 4.

Usage:
    python3 scripts/bench_scaling.py [--sf /root/testdata/sf0.1] [--repl 16]
        [--n 8] [--xn 32] [--out BENCH_SCALING.md]

Each measurement runs in its own subprocess (a local[] core count is fixed
at JVM startup), with one warm-up pass (Arrow worker spin-up) before the
timed pass. Input is pre-written parquet with enough file splits for the
widest run, so both runs read identical bytes with identical split
boundaries.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def runner(cpus: int, input_path: str) -> None:
    """Subprocess mode: time one extraction pass at local[cpus]."""
    from pyspark.sql import SparkSession, functions as F

    from webx.config import ExtractConfig
    from webx.pipeline import run_extraction

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"webx-scaling-{cpus}")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    pages = spark.read.parquet(input_path)
    stats = pages.select(
        F.count("*").alias("n"), F.sum(F.octet_length("html")).alias("b")
    ).first()
    cfg = ExtractConfig()

    def one_pass() -> float:
        t0 = time.perf_counter()
        run_extraction(pages, cfg).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    one_pass()  # warm-up: JVM JIT + Arrow python workers
    dt = min(one_pass(), one_pass())  # best of 2 timed passes
    print(
        "RESULT "
        + json.dumps(
            {
                "cpus": cpus,
                "docs": int(stats["n"]),
                "mb": round(stats["b"] / 1e6, 1),
                "sec": round(dt, 3),
                "docs_per_sec": round(stats["n"] / dt, 1),
                "mb_per_sec": round(stats["b"] / dt / 1e6, 2),
            }
        )
    )
    spark.stop()


def materialize(sf: str, repl: int, path: str, files: int) -> None:
    from pyspark.sql import SparkSession, functions as F

    from webx import synth

    spark = (
        SparkSession.builder.master("local[16]")
        .appName("webx-scaling-setup")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    pages = synth.synth_pages(spark, sf)
    reps = spark.range(repl).select(F.col("id").alias("rep"))
    big = (
        pages.crossJoin(reps)
        .withColumn("url", F.concat_ws("#", "url", F.col("rep").cast("string")))
        .drop("rep")
        .repartition(files, "url")
    )
    big.write.mode("overwrite").parquet(path)
    spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--repl", type=int, default=16)
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--xn", type=int, default=32)
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH_SCALING.md"))
    ap.add_argument("--runner-cpus", type=int, default=None, help=argparse.SUPPRESS)
    ap.add_argument("--runner-input", default=None, help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args.runner_cpus:
        runner(args.runner_cpus, args.runner_input)
        return

    tmp = tempfile.mkdtemp(prefix="webx_scaling_")
    input_path = os.path.join(tmp, "pages")
    print(f"materializing input: {args.sf} x{args.repl} -> {input_path}", file=sys.stderr)
    materialize(args.sf, args.repl, input_path, files=args.xn * 4)

    results = {}
    for cpus in (args.n, args.xn):
        print(f"timing local[{cpus}] ...", file=sys.stderr)
        out = subprocess.run(
            [
                sys.executable,
                os.path.abspath(__file__),
                "--runner-cpus",
                str(cpus),
                "--runner-input",
                input_path,
            ],
            capture_output=True,
            text=True,
            check=True,
            cwd=REPO,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("RESULT ")][-1]
        results[cpus] = json.loads(line[len("RESULT "):])

    rn, rx = results[args.n], results[args.xn]
    speedup = rx["docs_per_sec"] / rn["docs_per_sec"]
    eff = speedup / (args.xn / args.n)
    summary = {
        "n_cores": args.n,
        "xn_cores": args.xn,
        "docs": rn["docs"],
        "mb_html": rn["mb"],
        "n": rn,
        "xn": rx,
        "speedup": round(speedup, 2),
        "scaling_efficiency": round(eff, 3),
    }
    print(json.dumps(summary))

    with open(args.out, "w") as f:
        f.write(
            f"""# BENCH_SCALING — throughput at N vs 4N parallelism

The north rule's two-cluster-size criterion, evidenced in-sandbox by the
identical extraction job at `local[{args.n}]` vs `local[{args.xn}]` on the
identical materialized input (synth flagship pages from `{args.sf}`
replicated ×{args.repl}; {rn['docs']:,} documents, {rn['mb']} MB of HTML).
Method: one warm-up pass then best-of-2 timed full materializations
(`noop` sink — measures the whole distributed plan). See
`scripts/bench_scaling.py`.

| cores | wall sec | docs/sec | MB/s HTML decoded |
|---|---|---|---|
| {args.n} | {rn['sec']} | {rn['docs_per_sec']:,} | {rn['mb_per_sec']} |
| {args.xn} | {rx['sec']} | {rx['docs_per_sec']:,} | {rx['mb_per_sec']} |

**Speedup {args.n}→{args.xn} cores: {speedup:.2f}× — scaling efficiency
{eff:.3f}** (target ≥ 0.8).

Why it scales: the extraction plan is embarrassingly parallel — scan →
`mapInPandas` → sink with no shuffle; input pre-split into
{args.xn * 4} files so both runs get identical balanced splits; per-task
work is Arrow-batched with no per-row Python.
"""
        )
    print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
