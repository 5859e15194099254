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


def test_no_full_history_scan_in_round_loop(spark, tmp_path, monkeypatch):
    """VERDICT r2 task 4: with daily budgets + retries + recrawl all ON,
    the round loop must never re-scan a table's full round history — the
    running host_spend/last_fetch tables carry that state. The single
    allowed read_all is the seen table (the exact-dedup backstop, bounded
    separately by compaction)."""
    from data_collector_spark.crawler import state as state_mod

    calls = []
    orig = state_mod.CrawlState.read_all

    def spy(self, spark_, table):
        calls.append(table)
        return orig(self, spark_, table)

    monkeypatch.setattr(state_mod.CrawlState, "read_all", spy)

    corpus_dir = str(tmp_path / "c3")
    synth_pages(spark, 20, n_hosts=2, links_per_page=2, dead_frac=0.2,
                partitions=1).write.parquet(corpus_dir)
    pages = spark.read.parquet(corpus_dir)
    seeds = pages.select(F.col("url_canon").alias("url")).withColumn(
        "priority", F.lit(0)
    )
    robots = spark.createDataFrame([], "host string, path_prefix string")
    budgets = spark.createDataFrame([("", 10)], "host string, budget_per_round int")
    run_crawl(
        spark, str(tmp_path / "wd3"), pages, seeds, robots, budgets,
        CrawlConfig(max_rounds=6, default_budget=10, retry_max=2,
                    daily_budget=15, rounds_per_day=3,
                    recrawl_ttl_rounds=2),
    )
    assert set(calls) <= {"seen"}, f"full-history scans inside the loop: {calls}"
    # and the running tables hold exactly one round dir each (pruned)
    import os

    for t in ("host_spend", "last_fetch"):
        base = str(tmp_path / "wd3" / t)
        if os.path.isdir(base):
            dirs = [e for e in os.listdir(base) if e.startswith("round=")]
            # zero is legal (e.g. host_spend skipped at a window boundary)
            assert len(dirs) <= 1, f"{t} not pruned: {dirs}"
