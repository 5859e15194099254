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
