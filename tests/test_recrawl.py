"""Stale re-crawl (R6 warden TTL re-check / A4 stale detection): URLs
last fetched more than ttl rounds ago re-enter the frontier and get
re-fetched at lower priority."""

from pyspark.sql import functions as F

from data_collector_spark.crawler.driver import CrawlConfig, run_crawl
from data_collector_spark.crawler.state import CrawlState
from data_collector_spark.sources.generator import synth_pages


def test_stale_urls_refetched(spark, tmp_path):
    corpus_dir = str(tmp_path / "corpus")
    # tiny closed corpus: everything is fetched in round 0, then goes stale
    synth_pages(spark, 12, n_hosts=2, links_per_page=2, dead_frac=0.0,
                partitions=1).write.parquet(corpus_dir)
    pages = spark.read.parquet(corpus_dir)
    seeds = pages.select(F.col("url_canon").alias("url")).withColumn(
        "priority", F.lit(0)
    )
    robots = spark.createDataFrame([], "host string, path_prefix string")
    budgets = spark.createDataFrame([("", 50)], "host string, budget_per_round int")

    wd = str(tmp_path / "wd")
    run_crawl(
        spark, wd, pages, seeds, robots, budgets,
        CrawlConfig(max_rounds=5, default_budget=50,
                    recrawl_ttl_rounds=2, recrawl_priority=2),
    )
    state = CrawlState(wd)
    fetched = state.read_all(spark, "fetch_log").filter(F.col("status") == "fetched")
    per_url = fetched.groupBy("url_sha1").count()
    # every corpus URL was fetched at least twice within 5 rounds
    assert per_url.filter("count >= 2").count() == 12
    # re-fetches happen only after the TTL gap
    rounds = (
        fetched.groupBy("url_sha1")
        .agg(F.min("round").alias("first"), F.max("round").alias("last"))
        .collect()
    )
    assert all(r["last"] - r["first"] >= 2 + 1 for r in rounds if r["last"] != r["first"])


def test_recrawl_off_by_default(spark, tmp_path):
    corpus_dir = str(tmp_path / "c2")
    synth_pages(spark, 12, n_hosts=2, links_per_page=2, dead_frac=0.0,
                partitions=1).write.parquet(corpus_dir)
    pages = spark.read.parquet(corpus_dir)
    seeds = pages.select(F.col("url_canon").alias("url")).withColumn(
        "priority", F.lit(0)
    )
    robots = spark.createDataFrame([], "host string, path_prefix string")
    budgets = spark.createDataFrame([("", 50)], "host string, budget_per_round int")
    run_crawl(
        spark, str(tmp_path / "wd2"), pages, seeds, robots, budgets,
        CrawlConfig(max_rounds=5, default_budget=50),
    )
    state = CrawlState(str(tmp_path / "wd2"))
    fetched = state.read_all(spark, "fetch_log").filter(F.col("status") == "fetched")
    assert fetched.groupBy("url_sha1").count().filter("count > 1").count() == 0
