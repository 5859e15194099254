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
