"""Robots/warden filter: whole-host block, subtree block, pass-through."""

import hashlib
from datetime import datetime

from data_collector_spark.operators.robots import split_robots


def fdf(spark, urls):
    rows = [
        (u, hashlib.sha1(u.encode()).hexdigest(), u.split("://")[1].split("/")[0])
        for u in urls
    ]
    return spark.createDataFrame(rows, "url_canon string, url_sha1 string, host string")


def test_split_robots(spark):
    robots = spark.createDataFrame(
        [
            ("h3.test", "", datetime(2024, 1, 1)),
            ("h2.test", "/p/1", datetime(2024, 1, 1)),
        ],
        "host string, path_prefix string, checked_ts timestamp",
    )
    urls = [
        "http://h1.test/p/1",      # allowed (rule is for h2)
        "http://h2.test/p/10",     # blocked (prefix /p/1)
        "http://h2.test/p/2",      # allowed
        "http://h3.test/",         # blocked (whole host)
        "http://h3.test/p/5",      # blocked (whole host)
        "http://h4.test/x",        # allowed (no rules)
    ]
    allowed, blocked = split_robots(fdf(spark, urls), robots)
    assert sorted(r["url_canon"] for r in allowed.collect()) == [
        "http://h1.test/p/1",
        "http://h2.test/p/2",
        "http://h4.test/x",
    ]
    assert sorted(r["url_canon"] for r in blocked.collect()) == [
        "http://h2.test/p/10",
        "http://h3.test/",
        "http://h3.test/p/5",
    ]


def test_no_rules_passthrough(spark):
    robots = spark.createDataFrame(
        [], "host string, path_prefix string, checked_ts timestamp"
    )
    f = fdf(spark, ["http://a.test/x"])
    allowed, blocked = split_robots(f, robots)
    assert allowed.count() == 1 and blocked.count() == 0


def test_parse_robots_txt_groups_and_prefixes(spark):
    from data_collector_spark.operators.robots import parse_robots_txt

    txt = "\r\n".join([
        "# global rules",
        "User-agent: *",
        "Disallow: /private/",
        "Disallow:",               # empty disallow = allow-all, no rule
        "Disallow: /tmp:colon/",   # value containing ':'
        "",
        "User-agent: googlebot",
        "User-agent: dcs-bot",     # OR-ed into the same group
        "Disallow: /bot-only/",
        "",
        "User-agent: otherbot",
        "Disallow: /other/",
        "Sitemap: http://h.test/sitemap.xml",
    ])
    df = spark.createDataFrame([("h.test", txt)], "host string, robots_txt string")
    star = {r["path_prefix"] for r in parse_robots_txt(df, agent="*").collect()}
    assert star == {"/private/", "/tmp:colon/"}
    bot = {r["path_prefix"] for r in parse_robots_txt(df, agent="dcs-bot").collect()}
    # a specific agent matches both its own group and the '*' group
    assert bot == {"/private/", "/tmp:colon/", "/bot-only/"}
    other = {r["path_prefix"] for r in parse_robots_txt(df, agent="otherbot").collect()}
    assert other == {"/private/", "/tmp:colon/", "/other/"}


def test_parse_robots_txt_feeds_split_robots(spark):
    from data_collector_spark.operators.robots import parse_robots_txt, split_robots

    txt = "User-agent: *\nDisallow: /blocked/"
    rules = parse_robots_txt(
        spark.createDataFrame([("h0.test", txt)], "host string, robots_txt string")
    )
    frontier = spark.createDataFrame(
        [
            ("http://h0.test/blocked/a", "h0.test"),
            ("http://h0.test/ok/a", "h0.test"),
            ("http://h1.test/blocked/a", "h1.test"),
        ],
        "url_canon string, host string",
    )
    allowed, blocked = split_robots(frontier, rules)
    assert {r["url_canon"] for r in blocked.collect()} == {"http://h0.test/blocked/a"}
    assert allowed.count() == 2


def test_allow_precedence_longest_match(spark):
    """RFC 9309 §2.2.2: the longest matching prefix wins — the big-site
    idiom ``Disallow: /`` + ``Allow: /public/`` must admit /public/..."""
    from data_collector_spark.operators.robots import parse_robots_txt, split_robots

    txt = "User-agent: *\nDisallow: /\nAllow: /public/"
    rules = parse_robots_txt(
        spark.createDataFrame([("h0.test", txt)], "host string, robots_txt string")
    )
    assert {
        (r["path_prefix"], r["allow"]) for r in rules.collect()
    } == {("/", False), ("/public/", True)}
    frontier = fdf(spark, [
        "http://h0.test/public/a",   # allowed: 8-char Allow beats 1-char Disallow
        "http://h0.test/public/",    # allowed
        "http://h0.test/private/a",  # blocked: only Disallow: / matches
        "http://h0.test/",           # blocked
        "http://h0.test/publicity",  # hmm: /public/ does NOT prefix /publicity -> blocked
    ])
    allowed, blocked = split_robots(frontier, rules)
    assert sorted(r["url_canon"] for r in allowed.collect()) == [
        "http://h0.test/public/",
        "http://h0.test/public/a",
    ]
    assert blocked.count() == 3


def test_allow_wins_length_ties_and_nesting(spark):
    from data_collector_spark.operators.robots import parse_robots_txt, split_robots

    txt = "\n".join([
        "User-agent: *",
        "Disallow: /ab",
        "Allow: /ab",          # same length: Allow wins the tie
        "Allow: /p/",
        "Disallow: /p/q/",     # longer Disallow re-blocks inside an Allow
    ])
    rules = parse_robots_txt(
        spark.createDataFrame([("h0.test", txt)], "host string, robots_txt string")
    )
    frontier = fdf(spark, [
        "http://h0.test/ab/x",   # tie -> allowed
        "http://h0.test/p/ok",   # allowed
        "http://h0.test/p/q/z",  # blocked (longest match is Disallow /p/q/)
    ])
    allowed, blocked = split_robots(frontier, rules)
    assert sorted(r["url_canon"] for r in allowed.collect()) == [
        "http://h0.test/ab/x",
        "http://h0.test/p/ok",
    ]
    assert [r["url_canon"] for r in blocked.collect()] == ["http://h0.test/p/q/z"]


def test_allow_rules_reach_the_crawl_engine(spark, tmp_path):
    """run_crawl with an allow-bearing rules table honors precedence: under
    Disallow:/ + Allow:/p/1, only /p/1* URLs are fetched and every other
    frontier entry logs as robots-blocked."""
    from pyspark.sql import functions as F

    from data_collector_spark.crawler.driver import CrawlConfig, run_crawl
    from data_collector_spark.crawler.state import CrawlState
    from data_collector_spark.sources.generator import (
        synth_pages,
        synth_politeness,
        synth_seeds,
    )

    corpus = str(tmp_path / "corpus")
    synth_pages(spark, 60, n_hosts=1, partitions=2).write.parquet(corpus)
    pages = spark.read.parquet(corpus)
    robots = spark.createDataFrame(
        [("h0.test", "/", False), ("h0.test", "/p/1", True)],
        "host string, path_prefix string, allow boolean",
    )
    wd = str(tmp_path / "wd")
    run_crawl(
        spark, wd, pages, synth_seeds(spark, 60, n_hosts=1),
        robots, synth_politeness(spark, 100),
        CrawlConfig(max_rounds=2, default_budget=100),
    )
    log = CrawlState(wd).read_all(spark, "fetch_log")
    fetched = [r["url_canon"] for r in log.filter(F.col("status") == "fetched").collect()]
    assert fetched and all("/p/1" in u for u in fetched)
    assert log.filter(F.col("status") == "robots").count() > 0
    assert (
        log.filter((F.col("status") == "robots") & F.col("url_canon").contains("/p/1"))
        .count() == 0
    )


def test_shuffle_mode_matches_broadcast_mode(spark):
    """broadcast=False (the above-gate web-scale path) must produce the
    identical allowed/blocked split — mirror of the wave gate's
    test_broadcast_gate_preserves_semantics."""
    from data_collector_spark.operators.robots import parse_robots_txt, split_robots

    txt = "User-agent: *\nDisallow: /\nAllow: /public/"
    rules = parse_robots_txt(
        spark.createDataFrame([("h0.test", txt)], "host string, robots_txt string")
    )
    frontier = fdf(spark, [
        "http://h0.test/public/a",
        "http://h0.test/private/a",
        "http://h0.test/",
        "http://h1.test/x",
    ])

    def snap(broadcast):
        allowed, blocked = split_robots(frontier, rules, broadcast=broadcast)
        return (
            sorted(r["url_canon"] for r in allowed.collect()),
            sorted(r["url_canon"] for r in blocked.collect()),
        )

    assert snap(True) == snap(False) == (
        ["http://h0.test/public/a", "http://h1.test/x"],
        ["http://h0.test/", "http://h0.test/private/a"],
    )


def test_shuffle_mode_plan_has_no_broadcast(spark):
    """Above the gate the rules side must NOT be planned as a broadcast —
    pinned with size-based auto-broadcast disabled so the assertion tests
    the gate, not the optimizer's small-table estimate."""
    rules = spark.createDataFrame(
        [("h0.test", "/x", False)], "host string, path_prefix string, allow boolean"
    )
    frontier = fdf(spark, ["http://h0.test/x/1", "http://h0.test/y"])
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        shuffled, _ = split_robots(frontier, rules, broadcast=False)
        bcast, _ = split_robots(frontier, rules, broadcast=True)
        assert "BroadcastHashJoin" not in shuffled._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in bcast._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_robots_gate_preserves_crawl_semantics(spark, tmp_path):
    """robots_broadcast_max_rows=0 forces the shuffle path through the full
    engine; fetch log and statuses must match the broadcast path."""
    from pyspark.sql import functions as F

    from data_collector_spark.crawler.driver import CrawlConfig, run_crawl
    from data_collector_spark.crawler.state import CrawlState
    from data_collector_spark.sources.generator import (
        synth_pages,
        synth_politeness,
        synth_seeds,
    )

    corpus = str(tmp_path / "corpus")
    synth_pages(spark, 60, n_hosts=2, partitions=2).write.parquet(corpus)
    pages = spark.read.parquet(corpus)
    robots = spark.createDataFrame(
        [("h0.test", "/", False), ("h0.test", "/p/1", True)],
        "host string, path_prefix string, allow boolean",
    )

    def snap(name, **cfg_kw):
        wd = str(tmp_path / name)
        run_crawl(
            spark, wd, pages, synth_seeds(spark, 60, n_hosts=2),
            robots, synth_politeness(spark, 100),
            CrawlConfig(max_rounds=2, default_budget=100, **cfg_kw),
        )
        return sorted(
            (r["round"], r["host"], r["seq_in_host"] or -1, r["url_canon"], r["status"])
            for r in CrawlState(wd).read_all(spark, "fetch_log").collect()
        )

    a = snap("wd_bcast")
    b = snap("wd_shuffle", robots_broadcast_max_rows=0)
    assert a == b
    assert any(r[4] == "robots" for r in a) and any(r[4] == "fetched" for r in a)


def test_sitemaps_from_robots_and_bootstrap_chain(spark):
    """Sitemap: directives are host-global (RFC 9309 §2.3) — extracted
    regardless of user-agent groups — and chain into seeds via
    seeds_from_sitemaps(corpus=...): robots.txt -> sitemap -> urlset."""
    from pyspark.sql import functions as F

    from data_collector_spark.operators.robots import sitemaps_from_robots
    from data_collector_spark.sources.sitemap import seeds_from_sitemaps

    txt = "\n".join([
        "Sitemap: http://h0.test/sitemap.xml",
        "User-agent: otherbot",
        "Disallow: /x",
        "sitemap: http://h0.test/sitemap2.xml   ",  # case + trailing space
        "# Sitemap: http://h0.test/commented.xml",
    ])
    df = spark.createDataFrame([("h0.test", txt)], "host string, robots_txt string")
    maps = {r["sitemap_url"] for r in sitemaps_from_robots(df).collect()}
    assert maps == {"http://h0.test/sitemap.xml", "http://h0.test/sitemap2.xml"}

    # full bootstrap: the fetched sitemap bodies (an index + a urlset)
    # resolve into crawl seeds
    urlset = "<urlset><url><loc>http://h0.test/page1</loc></url></urlset>"
    index = ("<sitemapindex><sitemap><loc>http://h0.test/child.xml</loc>"
             "</sitemap></sitemapindex>")
    corpus = spark.createDataFrame(
        [
            ("http://h0.test/sitemap.xml", index.encode()),
            ("http://h0.test/child.xml", urlset.encode()),
            ("http://h0.test/sitemap2.xml",
             b"<urlset><url><loc>http://h0.test/page2</loc></url></urlset>"),
        ],
        "url_canon string, html binary",
    )
    docs = (
        spark.createDataFrame(
            [(u,) for u in sorted(maps)], "url_canon string"
        )
        .join(corpus, "url_canon")
        .select(F.col("html").cast("string").alias("sitemap_xml"))
    )
    seeds = {r["url"] for r in seeds_from_sitemaps(docs, corpus=corpus).collect()}
    assert seeds == {"http://h0.test/page1", "http://h0.test/page2"}


def test_parse_robots_txt_whole_host_block(spark):
    from data_collector_spark.operators.robots import parse_robots_txt, split_robots

    rules = parse_robots_txt(
        spark.createDataFrame(
            [("h0.test", "User-agent: *\nDisallow: /")],
            "host string, robots_txt string",
        )
    )
    frontier = spark.createDataFrame(
        [("http://h0.test/anything", "h0.test"), ("http://h0.test/", "h0.test")],
        "url_canon string, host string",
    )
    allowed, blocked = split_robots(frontier, rules)
    assert allowed.count() == 0 and blocked.count() == 2
