#!/usr/bin/env python3
"""Two-cluster-size scaling evidence (BASELINE.json north_rule).

No real cluster exists in this sandbox, so the same crawl job runs at two
local parallelism levels (default local[8] vs local[32] — N and 4N cores)
over the SAME pre-generated corpus; reported: throughput at both +
efficiency = (throughput_4N / throughput_N) / 4, target >= 0.8.

Each level runs in its own subprocess (a JVM can't change master). The
corpus is generated once (deterministic, partition-independent) and read
from parquet by both runs.

Usage: python scripts/bench_scaling.py [--n-urls 600000] [--update-baseline]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUN_TEMPLATE = r"""
import json, shutil, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from data_collector_spark.session import get_spark
from data_collector_spark.crawler.driver import CrawlConfig, run_crawl

cores = {cores}
spark = get_spark("dcs-scaling", cores=cores)
pages = spark.read.parquet({corpus!r})
seeds = (pages.select(F.col("url_canon").alias("url")).orderBy("url")
         .limit({seeds}).withColumn("priority", F.lit(0)))
robots = spark.createDataFrame([], "host string, path_prefix string")
budgets = spark.createDataFrame([("", {budget})], "host string, budget_per_round int")
wd = {workdir!r}
shutil.rmtree(wd, ignore_errors=True)

t0 = time.monotonic()
ms = run_crawl(spark, wd, pages, seeds, robots, budgets,
               CrawlConfig(max_rounds={rounds}, default_budget={budget}))
wall = time.monotonic() - t0
fetched = sum(m.fetched for m in ms)
deduped = sum(m.deduped for m in ms)
enqueued = sum(m.enqueued for m in ms)
processed = fetched + deduped + enqueued
print("RESULT " + json.dumps({{
    "cores": cores, "wall_sec": round(wall, 2), "fetched": fetched,
    "deduped": deduped, "enqueued": enqueued,
    "urls_per_sec": round(processed / wall, 1),
    "rounds": [m.as_dict() for m in ms],
}}))
"""


def run_level(cores: int, corpus: str, budget: int, rounds: int, seeds: int) -> dict:
    code = RUN_TEMPLATE.format(
        repo=REPO, cores=cores, corpus=corpus, budget=budget, rounds=rounds,
        seeds=seeds, workdir=tempfile.mkdtemp(prefix=f"dcs_scale_{cores}_"),
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, check=True,
        cwd=REPO,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT line; stderr tail: {out.stderr[-2000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-urls", type=int, default=600_000)
    ap.add_argument("--n-hosts", type=int, default=3000)
    ap.add_argument("--budget", type=int, default=120)
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--seeds", type=int, default=200_000)
    ap.add_argument("--cores-a", type=int, default=8)
    ap.add_argument("--cores-b", type=int, default=32)
    ap.add_argument("--corpus-dir", default=None, help="reuse an existing corpus")
    args = ap.parse_args()

    corpus = args.corpus_dir
    if corpus is None:
        corpus = tempfile.mkdtemp(prefix="dcs_scale_corpus_")
        gen = r"""
import sys; sys.path.insert(0, {repo!r})
from data_collector_spark.session import get_spark
from data_collector_spark.sources.generator import synth_pages
spark = get_spark("dcs-gen", cores=32)
synth_pages(spark, {n}, n_hosts={h}, links_per_page=8, partitions=64)\
    .write.mode("overwrite").parquet({corpus!r})
print("GENDONE")
""".format(repo=REPO, n=args.n_urls, h=args.n_hosts, corpus=corpus)
        subprocess.run([sys.executable, "-c", gen], check=True, cwd=REPO,
                       capture_output=True, text=True)

    a = run_level(args.cores_a, corpus, args.budget, args.rounds, args.seeds)
    b = run_level(args.cores_b, corpus, args.budget, args.rounds, args.seeds)
    ratio = args.cores_b / args.cores_a
    eff = (b["urls_per_sec"] / a["urls_per_sec"]) / ratio
    result = {
        "corpus": {"n_urls": args.n_urls, "n_hosts": args.n_hosts,
                   "budget": args.budget, "rounds": args.rounds, "dir": corpus},
        "level_a": a,
        "level_b": b,
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "pass": eff >= 0.8,
    }
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
