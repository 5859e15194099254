"""Property-style invariants under randomized configs — the analog of the
reference's randomized scheduler tests
(/root/reference/src/dag_schedule/schedule.rs:382-397): any seed set +
budget assignment must preserve the crawl invariants."""

import random

import pytest
from pyspark.sql import functions as F

from data_collector_spark.crawler.driver import CrawlConfig, run_crawl
from data_collector_spark.crawler.state import CrawlState
from data_collector_spark.sources.generator import synth_pages, url_of

N_URLS = 120
N_HOSTS = 5


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("prop_corpus"))
    synth_pages(spark, N_URLS, n_hosts=N_HOSTS, partitions=3).write.mode(
        "overwrite"
    ).parquet(d)
    return spark.read.parquet(d)


@pytest.mark.parametrize("case_seed", [7, 99])
def test_invariants_random_config(spark, tmp_path, corpus, case_seed):
    rng = random.Random(case_seed)
    seed_ids = rng.sample(range(N_URLS), rng.randint(3, 12))
    seeds = spark.createDataFrame(
        [(url_of(i, N_HOSTS, 2.0, 42), rng.randint(0, 1)) for i in seed_ids],
        "url string, priority int",
    )
    budgets = spark.createDataFrame(
        [("", rng.randint(1, 4))]
        + [(f"h{h}.test", rng.randint(1, 5)) for h in range(N_HOSTS) if rng.random() < 0.5],
        "host string, budget_per_round int",
    )
    robots = spark.createDataFrame(
        [(f"h{rng.randrange(N_HOSTS)}.test", "")],
        "host string, path_prefix string",
    )
    budget_map = {r["host"]: r["budget_per_round"] for r in budgets.collect()}
    default_b = budget_map.pop("")

    wd = str(tmp_path / f"prop{case_seed}")
    metrics = run_crawl(
        spark, wd, corpus, seeds, robots, budgets, CrawlConfig(max_rounds=4)
    )
    assert metrics, "crawl ran no rounds"
    state = CrawlState(wd)
    log = state.read_all(spark, "fetch_log")
    fetched = log.filter(F.col("status") == "fetched")

    # no URL fetched twice
    assert fetched.groupBy("url_sha1").count().filter("count > 1").count() == 0

    # robots respected
    blocked_host = robots.collect()[0]["host"]
    assert fetched.filter(F.col("host") == blocked_host).count() == 0

    # per-(round,host) budget respected and seq contiguous over the whole
    # wave (dead links consume budget and sequence slots too)
    rows = (
        log.filter(F.col("status") != "robots")
        .select("round", "host", "seq_in_host")
        .collect()
    )
    by_rh = {}
    for r in rows:
        by_rh.setdefault((r["round"], r["host"]), []).append(r["seq_in_host"])
    for (rnd, host), seqs in by_rh.items():
        limit = budget_map.get(host, default_b)
        assert len(seqs) <= limit, f"budget exceeded for {host} round {rnd}"
        assert sorted(seqs) == list(range(1, len(seqs) + 1))

    # every frontier entry is in seen (enqueue implies seen)
    seen = state.read_all(spark, "seen").select("url_sha1")
    f_all = state.read_all(spark, "frontier").select("url_sha1").distinct()
    assert f_all.join(seen, "url_sha1", "left_anti").count() == 0
