"""Crash-debris recovery: a crash mid-round leaves uncommitted round
directories; resume must drop them and reproduce the clean-run state
(the idempotency decision record, /root/reference/documentation/
decisions/03-idempotent-actions.md, re-expressed as snapshot commits)."""

import shutil

from pyspark.sql import functions as F

from data_collector_spark.crawler.driver import CrawlConfig, run_crawl
from data_collector_spark.crawler.state import CrawlState
from data_collector_spark.sources.generator import (
    synth_pages,
    synth_politeness,
    synth_robots,
    synth_seeds,
)

N = 100


def crawl_args(spark, corpus):
    return (
        corpus,
        synth_seeds(spark, N, n_hosts=4),
        synth_robots(spark),
        synth_politeness(spark, default_budget=3),
    )


def final_state(spark, st: CrawlState):
    seen = sorted(r["url_sha1"] for r in st.read_all(spark, "seen").collect())
    log = sorted(
        (r["round"], r["host"], r["seq_in_host"], r["url_sha1"])
        for r in st.read_all(spark, "fetch_log")
        .filter(F.col("status") == "fetched")
        .collect()
    )
    return seen, log


def test_crash_debris_dropped_on_resume(spark, tmp_path):
    corpus_dir = str(tmp_path / "corpus")
    synth_pages(spark, N, n_hosts=4, partitions=2).write.parquet(corpus_dir)
    corpus = spark.read.parquet(corpus_dir)

    # clean reference run: 3 rounds
    wd_clean = str(tmp_path / "clean")
    run_crawl(spark, wd_clean, *crawl_args(spark, corpus), CrawlConfig(max_rounds=3))

    # crashed run: stop after round 1, then fake a round-2 crash by
    # writing partial (garbage) outputs without committing
    wd = str(tmp_path / "crashed")
    run_crawl(spark, wd, *crawl_args(spark, corpus), CrawlConfig(max_rounds=2))
    st = CrawlState(wd)
    garbage = spark.createDataFrame(
        [("http://garbage.test/x", "deadbeef", "garbage.test", 0, "fetched")],
        "url_canon string, url_sha1 string, host string, seq_in_host int, status string",
    )
    st.write_round("fetch_log", 2, garbage)         # partial round-2 output
    st.write_round("seen", 3, garbage.select("url_sha1", "url_canon"))
    st.write_round("frontier", 3, spark.read.parquet(f"{wd}/frontier/round=2"))

    # resume to 3 rounds: debris must vanish, state must equal clean run
    run_crawl(spark, wd, *crawl_args(spark, corpus), CrawlConfig(max_rounds=3))
    assert final_state(spark, CrawlState(wd)) == final_state(
        spark, CrawlState(wd_clean)
    )
    log = CrawlState(wd).read_all(spark, "fetch_log")
    assert log.filter(F.col("host") == "garbage.test").count() == 0
