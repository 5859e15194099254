"""Politeness wave pop: budgets, deterministic ordering, skew-salt
equivalence with the naive single-window plan."""

import hashlib
from datetime import datetime, timedelta

from pyspark.sql import Window
from pyspark.sql import functions as F

from data_collector_spark.operators.politeness import ORDER_COLS, pop_wave


def make_frontier(spark, n=300, hosts=6):
    rows = []
    base = datetime(2024, 1, 1)
    for i in range(n):
        url = f"http://h{i % hosts}.test/p/{i}"
        rows.append(
            (
                url,
                hashlib.sha1(url.encode()).hexdigest(),
                f"h{i % hosts}.test",
                i % 4,
                base + timedelta(seconds=i % 50),
                1 if i % 10 else 0,
            )
        )
    return spark.createDataFrame(
        rows,
        "url_canon string, url_sha1 string, host string, depth int, "
        "discovery_ts timestamp, priority int",
    )


def budgets_df(spark, rows):
    return spark.createDataFrame(rows, "host string, budget_per_round int")


def test_budget_respected_and_partition_complete(spark):
    f = make_frontier(spark)
    wave, deferred = pop_wave(f, budgets_df(spark, [("", 3), ("h0.test", 1)]))
    per_host = {r["host"]: r["n"] for r in wave.groupBy("host").agg(F.count("*").alias("n")).collect()}
    assert per_host["h0.test"] == 1
    assert all(v == 3 for h, v in per_host.items() if h != "h0.test")
    assert wave.count() + deferred.count() == f.count()
    assert wave.join(deferred, "url_sha1", "inner").count() == 0


def test_ordering_deterministic_and_correct(spark):
    f = make_frontier(spark)
    wave, _ = pop_wave(f, budgets_df(spark, [("", 5)]))
    rows = sorted(wave.collect(), key=lambda r: (r["host"], r["seq_in_host"]))
    expected = sorted(
        f.collect(), key=lambda r: (r["host"],) + tuple(r[c] for c in ORDER_COLS)
    )
    by_host = {}
    for r in expected:
        by_host.setdefault(r["host"], []).append(r["url_sha1"])
    for r in rows:
        assert by_host[r["host"]][r["seq_in_host"] - 1] == r["url_sha1"]


def test_skew_salt_matches_naive_window(spark):
    f = make_frontier(spark, n=500, hosts=3)
    budgets = budgets_df(spark, [("", 4), ("h1.test", 7)])
    wave_salted, _ = pop_wave(f, budgets, skew_salt=16)

    # naive reference plan: one window per host, no salting
    w = Window.partitionBy("host").orderBy(*[F.col(c).asc() for c in ORDER_COLS])
    naive = (
        f.join(F.broadcast(budgets.filter(F.col("host") != "")), "host", "left")
        .withColumn("_b", F.coalesce("budget_per_round", F.lit(4)))
        .withColumn("seq_in_host", F.row_number().over(w))
        .filter(F.col("seq_in_host") <= F.col("_b"))
    )
    a = sorted((r["url_sha1"], r["seq_in_host"]) for r in wave_salted.collect())
    b = sorted((r["url_sha1"], r["seq_in_host"]) for r in naive.collect())
    assert a == b


def test_empty_frontier(spark):
    f = make_frontier(spark).limit(0)
    wave, deferred = pop_wave(f, budgets_df(spark, [("", 2)]))
    assert wave.count() == 0 and deferred.count() == 0


def test_daily_budget_exhausts_and_resets(spark, tmp_path):
    """R2 (/root/reference/src/api_keys/api_key.rs:79-106): a host may
    spend at most daily_budget requests per rounds_per_day window; it goes
    quiet mid-window when exhausted and resumes at the reset boundary."""
    from data_collector_spark.crawler.driver import CrawlConfig, run_crawl
    from data_collector_spark.crawler.state import CrawlState
    from data_collector_spark.sources.generator import synth_pages

    corpus_dir = str(tmp_path / "daily_corpus")
    synth_pages(spark, 10, n_hosts=1, links_per_page=2, dead_frac=0.0,
                partitions=1).write.parquet(corpus_dir)
    pages = spark.read.parquet(corpus_dir)
    seeds = pages.select(F.col("url_canon").alias("url")).withColumn(
        "priority", F.lit(0)
    )
    robots = spark.createDataFrame([], "host string, path_prefix string")
    budgets = spark.createDataFrame([("", 3)], "host string, budget_per_round int")
    metrics = run_crawl(
        spark, str(tmp_path / "daily_wd"), pages, seeds, robots, budgets,
        CrawlConfig(max_rounds=5, default_budget=3,
                    daily_budget=5, rounds_per_day=3),
    )
    state = CrawlState(str(tmp_path / "daily_wd"))
    per_round = {
        r["round"]: r["n"]
        for r in state.read_all(spark, "fetch_log")
        .filter(F.col("status").isin("fetched", "dead"))
        .groupBy("round").agg(F.count("*").alias("n")).collect()
    }
    # day 1 (rounds 0-2): 3 then 2 (5 total, exhausted), then 0;
    # day 2 (rounds 3-4): reset -> 3 then 2 again
    assert [per_round.get(n, 0) for n in range(5)] == [3, 2, 0, 3, 2]
    # exhausted-but-eligible URLs are deferred, never dropped
    assert all(m.deferred_by_politeness >= 0 for m in metrics)
    # within any window, no host exceeds the daily allowance
    day_tot = (
        state.read_all(spark, "fetch_log")
        .filter(F.col("status").isin("fetched", "dead"))
        .groupBy((F.col("round") / 3).cast("int").alias("day"), "host")
        .agg(F.count("*").alias("n"))
    )
    assert day_tot.filter(F.col("n") > 5).count() == 0


def test_daily_budget_caps_first_round_of_window(spark, tmp_path):
    """ADVICE r2: when budget_per_round > daily_budget the FIRST round of
    each window (no spend table yet) must still clamp to the daily
    allowance, not fetch the full per-round budget."""
    from data_collector_spark.crawler.driver import CrawlConfig, run_crawl
    from data_collector_spark.crawler.state import CrawlState
    from data_collector_spark.sources.generator import synth_pages

    corpus_dir = str(tmp_path / "daily_clamp_corpus")
    synth_pages(spark, 12, n_hosts=1, links_per_page=2, dead_frac=0.0,
                partitions=1).write.parquet(corpus_dir)
    pages = spark.read.parquet(corpus_dir)
    seeds = pages.select(F.col("url_canon").alias("url")).withColumn(
        "priority", F.lit(0)
    )
    robots = spark.createDataFrame([], "host string, path_prefix string")
    budgets = spark.createDataFrame([("", 6)], "host string, budget_per_round int")
    run_crawl(
        spark, str(tmp_path / "daily_clamp_wd"), pages, seeds, robots, budgets,
        CrawlConfig(max_rounds=4, default_budget=6,
                    daily_budget=4, rounds_per_day=2),
    )
    state = CrawlState(str(tmp_path / "daily_clamp_wd"))
    per_round = {
        r["round"]: r["n"]
        for r in state.read_all(spark, "fetch_log")
        .filter(F.col("status").isin("fetched", "dead"))
        .groupBy("round").agg(F.count("*").alias("n")).collect()
    }
    # window 1 (rounds 0-1): clamp 6->4 then 0 remaining;
    # window 2 (rounds 2-3): reset -> 4 then 0
    assert [per_round.get(n, 0) for n in range(4)] == [4, 0, 4, 0]


def test_host_spend_bootstraps_from_history_on_resume(spark, tmp_path):
    """ADVICE r3: a checkpoint that predates the running host_spend table
    (daily budgets enabled mid-crawl, or a pre-r4 workdir) must rebuild
    the window's spend from its fetch_log rounds on resume — otherwise a
    mid-window resume forgets prior spend and hosts overshoot the daily
    budget."""
    import shutil

    from data_collector_spark.crawler.driver import CrawlConfig, run_crawl
    from data_collector_spark.crawler.state import CrawlState
    from data_collector_spark.sources.generator import synth_pages

    corpus_dir = str(tmp_path / "bs_corpus")
    synth_pages(spark, 10, n_hosts=1, links_per_page=2, dead_frac=0.0,
                partitions=1).write.parquet(corpus_dir)
    pages = spark.read.parquet(corpus_dir)
    seeds = pages.select(F.col("url_canon").alias("url")).withColumn(
        "priority", F.lit(0)
    )
    robots = spark.createDataFrame([], "host string, path_prefix string")
    budgets = spark.createDataFrame([("", 3)], "host string, budget_per_round int")
    wd = str(tmp_path / "bs_wd")
    cfg = dict(default_budget=3, daily_budget=5, rounds_per_day=3)
    # rounds 0-1 spend the whole window allowance (3 + 2)
    run_crawl(spark, wd, pages, seeds, robots, budgets,
              CrawlConfig(max_rounds=2, **cfg))
    # simulate the pre-running-table checkpoint
    shutil.rmtree(str(tmp_path / "bs_wd" / "host_spend"), ignore_errors=True)
    # resume into round 2 — still inside the window; without the bootstrap
    # it would fetch 3 more (8 > the daily 5)
    run_crawl(spark, wd, pages, seeds, robots, budgets,
              CrawlConfig(max_rounds=5, **cfg))
    state = CrawlState(wd)
    per_round = {
        r["round"]: r["n"]
        for r in state.read_all(spark, "fetch_log")
        .filter(F.col("status").isin("fetched", "dead"))
        .groupBy("round").agg(F.count("*").alias("n")).collect()
    }
    assert [per_round.get(n, 0) for n in range(5)] == [3, 2, 0, 3, 2]


def test_budget_pools_rotate_on_exhaustion(spark):
    """R4 (/root/reference/src/api_keys/key_manager.rs:25-49): k pools of
    budget_per_round each — wave size is k x budget, pool 1 drains before
    pool 2 starts, and no pool serves more than its sub-budget."""
    from data_collector_spark.operators.politeness import compile_budgets, pop_wave_spec

    f = make_frontier(spark, n=300, hosts=6)
    spec = compile_budgets(spark, budgets_df(spark, [("", 3), ("h0.test", 2)]))
    wave, deferred = pop_wave_spec(f, spec, pools=2)
    rows = wave.collect()
    per_host = {}
    for r in rows:
        per_host.setdefault(r["host"], []).append((r["seq_in_host"], r["pool_id"]))
    for host, pairs in per_host.items():
        pairs.sort()
        b = 2 if host == "h0.test" else 3
        assert len(pairs) == 2 * b  # k x budget requests per round
        # rotation: first b requests on pool 1, next b on pool 2
        assert [p for _, p in pairs] == [1] * b + [2] * b
    # conservation still holds
    assert wave.count() + deferred.count() == f.count()
    # pools=1 leaves the schema untouched
    w1, _ = pop_wave_spec(f, spec, pools=1)
    assert "pool_id" not in w1.columns


def test_budget_pools_crawl_fetches_k_times_budget(spark, tmp_path):
    from data_collector_spark.crawler.driver import CrawlConfig, run_crawl
    from data_collector_spark.crawler.state import CrawlState
    from data_collector_spark.sources.generator import synth_pages

    corpus_dir = str(tmp_path / "pool_corpus")
    synth_pages(spark, 12, n_hosts=1, links_per_page=2, dead_frac=0.0,
                partitions=1).write.parquet(corpus_dir)
    pages = spark.read.parquet(corpus_dir)
    seeds = pages.select(F.col("url_canon").alias("url")).withColumn(
        "priority", F.lit(0)
    )
    robots = spark.createDataFrame([], "host string, path_prefix string")
    budgets = spark.createDataFrame([("", 2)], "host string, budget_per_round int")
    run_crawl(
        spark, str(tmp_path / "pool_wd"), pages, seeds, robots, budgets,
        CrawlConfig(max_rounds=2, default_budget=2, budget_pools=3),
    )
    state = CrawlState(str(tmp_path / "pool_wd"))
    per_round = {
        r["round"]: r["n"]
        for r in state.read_all(spark, "fetch_log")
        .filter(F.col("status").isin("fetched", "dead"))
        .groupBy("round").agg(F.count("*").alias("n")).collect()
    }
    # 3 pools x 2/round = 6 requests against the single host each round
    assert per_round[0] == 6


def test_compile_budgets_guards_driver_collect(spark):
    """VERDICT r6 #6: the once-per-crawl driver collect of the budget
    table is documented as config-sized — r7 enforces it with a row-count
    guard instead of silently materializing millions of host overrides."""
    import pytest
    from pyspark.sql import functions as F

    import data_collector_spark.operators.politeness as pol

    big = spark.range(0, 12).select(
        F.concat(F.lit("h"), F.col("id")).alias("host"),
        F.lit(3).alias("budget_per_round"),
    )
    old = pol.MAX_BUDGET_ROWS
    pol.MAX_BUDGET_ROWS = 10
    try:
        with pytest.raises(ValueError, match="budgets table exceeds"):
            pol.compile_budgets(spark, big)
    finally:
        pol.MAX_BUDGET_ROWS = old
    # at or under the guard the compiled spec is unchanged
    spec = pol.compile_budgets(spark, big.limit(5), default_budget=2)
    assert spec.default_budget == 2 and spec.bmax == 3
