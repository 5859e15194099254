#!/usr/bin/env python3
"""spark-submit entry point for the crawler.

Cluster usage (the package ships as a zip via --py-files):

    cd /root/repo && zip -qr /tmp/dcs.zip data_collector_spark
    spark-submit --py-files /tmp/dcs.zip scripts/crawl_job.py \
        --pages /path/pages_parquet --workdir /path/crawl_wd \
        --seeds /path/seeds_parquet --rounds 5 --budget 100

Local smoke (this sandbox):

    python scripts/crawl_job.py --pages /tmp/corpus --workdir /tmp/wd \
        --seed-sample 100 --rounds 2

The SparkSession comes from the environment when launched by
spark-submit (getOrCreate picks up the submitted conf); standalone it
falls back to the local session factory.
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", help="pipeline YAML/JSON (overrides other args)")
    ap.add_argument("--config-overlay",
                    help="overlay YAML/JSON merged over --config "
                         "(DCS__* env vars layer on top of both)")
    ap.add_argument("--pages", help="pages parquet (input_hint schema)")
    ap.add_argument("--pages-warc", action="store_true",
                    help="--pages points at WARC segment files instead of parquet")
    ap.add_argument("--workdir")
    ap.add_argument("--seeds", help="seeds parquet with (url, priority)")
    ap.add_argument("--seeds-sitemap",
                    help="seeds from sitemap.xml file(s) (text glob) instead")
    ap.add_argument("--seed-sample", type=int, default=0,
                    help="no seeds file: take N urls from pages as seeds")
    ap.add_argument("--training-set",
                    help="after the crawl, run the webtext bridge (exact + "
                         "MinHash dedup, filters, hash split) and write the "
                         "corpus parquet here")
    ap.add_argument("--lang", default=None,
                    help="language filter for --training-set (default: keep all)")
    ap.add_argument("--min-quality", type=float, default=0.5,
                    help="quality floor for --training-set")
    ap.add_argument("--benchmark",
                    help="parquet of held-out eval docs (doc_id, text); "
                         "training docs sharing a 13-gram are dropped")
    ap.add_argument("--max-dup-word-frac", type=float, default=None,
                    help="Gopher repetition cap: drop docs above this "
                         "duplicate-word fraction")
    ap.add_argument("--max-top-2gram-frac", type=float, default=None,
                    help="Gopher repetition cap: drop docs above this "
                         "top-2-gram fraction")
    ap.add_argument("--pack-budget", type=int, default=None,
                    help="append concat-and-chunk token span + chunk range "
                         "columns at this max_seq_len")
    ap.add_argument("--near-dup-resolution", default="greedy",
                    choices=["greedy", "components"],
                    help="near-dup pair resolution for --training-set "
                         "(components = chain-safe min-label propagation)")
    ap.add_argument("--robots", help="robots parquet (host, path_prefix)")
    ap.add_argument("--budgets", help="budgets parquet (host, budget_per_round)")
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--budget", type=int, default=100)
    args = ap.parse_args()

    spark = SparkSession.builder.appName("dcs-crawl").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from data_collector_spark.crawler.driver import CrawlConfig, run_crawl
    from data_collector_spark.functions.urls import with_canonical_url

    if args.config:
        from data_collector_spark.crawler.config import load_pipeline

        cfg, inputs, workdir = load_pipeline(args.config, overlay_path=args.config_overlay)
        pages = spark.read.parquet(inputs["pages"])
        if "url_canon" not in pages.columns:
            pages = with_canonical_url(pages).drop("url_sha1", "host")
        seeds = spark.read.parquet(inputs["seeds"])
        robots = (
            spark.read.parquet(inputs["robots"])
            if "robots" in inputs
            else spark.createDataFrame([], "host string, path_prefix string")
        )
        budgets = (
            spark.read.parquet(inputs["budgets"])
            if "budgets" in inputs
            else spark.createDataFrame(
                [("", cfg.default_budget)], "host string, budget_per_round int"
            )
        )
        metrics = run_crawl(spark, workdir, pages, seeds, robots, budgets, cfg)
        print(json.dumps({"rounds": [m.as_dict() for m in metrics]}, indent=1))
        return

    if not args.pages or not args.workdir:
        raise SystemExit("need --config or both --pages and --workdir")
    if args.pages_warc:
        from data_collector_spark.sources.warc import pages_from_warc

        pages = pages_from_warc(spark, args.pages)
    else:
        pages = spark.read.parquet(args.pages)
    if "url_canon" not in pages.columns:
        pages = with_canonical_url(pages).drop("url_sha1", "host")

    if args.seeds_sitemap:
        from data_collector_spark.sources.sitemap import seeds_from_sitemaps

        xml = spark.read.text(args.seeds_sitemap, wholetext=True)
        seeds = seeds_from_sitemaps(xml.withColumnRenamed("value", "sitemap_xml"))
    elif args.seeds:
        seeds = spark.read.parquet(args.seeds)
    elif args.seed_sample:
        seeds = (
            pages.select(F.col("url_canon").alias("url"))
            .orderBy("url")
            .limit(args.seed_sample)
            .withColumn("priority", F.lit(0))
        )
    else:
        raise SystemExit("need --seeds or --seed-sample")

    robots = (
        spark.read.parquet(args.robots)
        if args.robots
        else spark.createDataFrame([], "host string, path_prefix string")
    )
    budgets = (
        spark.read.parquet(args.budgets)
        if args.budgets
        else spark.createDataFrame([("", args.budget)], "host string, budget_per_round int")
    )

    metrics = run_crawl(
        spark, args.workdir, pages, seeds, robots, budgets,
        CrawlConfig(max_rounds=args.rounds, default_budget=args.budget),
    )
    out = {"rounds": [m.as_dict() for m in metrics]}
    if args.training_set:
        from data_collector_spark.crawler.webtext import build_training_set

        bench = (
            spark.read.parquet(args.benchmark).select("doc_id", "text")
            if args.benchmark
            else None
        )
        ts = build_training_set(
            spark, args.workdir, lang=args.lang, min_quality=args.min_quality,
            resolution=args.near_dup_resolution,
            benchmark=bench,
            max_dup_word_frac=args.max_dup_word_frac,
            max_top_2gram_frac=args.max_top_2gram_frac,
            pack_budget=args.pack_budget,
        ).persist()
        ts.write.mode("overwrite").partitionBy("split").parquet(args.training_set)
        out["training_set"] = {"path": args.training_set, "rows": ts.count()}
        ts.unpersist()
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
