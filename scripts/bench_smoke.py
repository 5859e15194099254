#!/usr/bin/env python3
"""1M-URL scale smoke, median-of-3 (VERDICT r4 #7).

The headline bench (bench.py) runs a 200k-URL crawl; this smoke drives a
1M-URL / 5,000-host corpus to frontier exhaustion on local[32] — the
largest single-box shape — and reports the same median + [min, max]
protocol the headline adopted in r4 so a future delta is adjudicable from
the artifact alone (single samples on this box swing +-25%).

Corpus and workdirs live on tmpfs (/dev/shm): /tmp disk writeback is the
documented 2-4x variance source. Prints ONE JSON line.

Usage: python scripts/bench_smoke.py [--samples 3] [--n-urls 1000000]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SCRATCH = os.environ.get(
    "DCS_BENCH_SCRATCH", "/dev/shm" if os.path.isdir("/dev/shm") else None
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=3)
    ap.add_argument("--n-urls", type=int, default=1_000_000)
    ap.add_argument("--n-hosts", type=int, default=5_000)
    ap.add_argument("--seeds", type=int, default=150_000)
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--budget", type=int, default=5_000)
    ap.add_argument("--cores", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from data_collector_spark.crawler.driver import CrawlConfig, run_crawl
    from data_collector_spark.session import get_spark
    from data_collector_spark.sources.generator import synth_pages

    spark = get_spark("dcs-smoke", cores=args.cores)
    corpus_dir = tempfile.mkdtemp(prefix="dcs_smoke_corpus_", dir=SCRATCH)
    try:
        synth_pages(
            spark, args.n_urls, n_hosts=args.n_hosts, links_per_page=8,
            partitions=64,
        ).write.mode("overwrite").parquet(corpus_dir)
        pages = spark.read.parquet(corpus_dir)
        seeds = (
            pages.select(F.col("url_canon").alias("url")).orderBy("url")
            .limit(args.seeds).withColumn("priority", F.lit(0))
        )
        robots = spark.createDataFrame([], "host string, path_prefix string")
        budgets = spark.createDataFrame(
            [("", args.budget)], "host string, budget_per_round int"
        )

        samples = []
        for s in range(max(args.samples, 1)):
            wd = tempfile.mkdtemp(prefix="dcs_smoke_wd_", dir=SCRATCH)
            try:
                t0 = time.monotonic()
                ms = run_crawl(
                    spark, wd, pages, seeds, robots, budgets,
                    CrawlConfig(max_rounds=args.rounds, default_budget=args.budget),
                )
                wall = time.monotonic() - t0
            finally:
                shutil.rmtree(wd, ignore_errors=True)
            fetched = sum(m.fetched for m in ms)
            processed = fetched + sum(m.deduped + m.enqueued for m in ms)
            samples.append(
                {
                    "wall_sec": round(wall, 1),
                    "fetched": fetched,
                    "processed": processed,
                    "ups": round(processed / wall, 1),
                }
            )
            print(f"[smoke] sample {s}: {samples[-1]}", file=sys.stderr, flush=True)
    finally:
        shutil.rmtree(corpus_dir, ignore_errors=True)

    med = sorted(samples, key=lambda x: x["ups"])[len(samples) // 2]
    print(
        json.dumps(
            {
                "metric": "1M smoke urls/s (fetched+deduped+enqueued per sec)",
                "value": med["ups"],
                "unit": "urls/s",
                "median_wall_sec": med["wall_sec"],
                "fetched": med["fetched"],
                "samples": [x["ups"] for x in samples],
                "urls_per_sec_min": min(x["ups"] for x in samples),
                "urls_per_sec_max": max(x["ups"] for x in samples),
                "corpus": {
                    "n_urls": args.n_urls, "n_hosts": args.n_hosts,
                    "seeds": args.seeds, "rounds": args.rounds,
                    "budget": args.budget, "cores": args.cores,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
