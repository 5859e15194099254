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
