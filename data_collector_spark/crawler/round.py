"""One crawl round — the engine's inner loop.

Spark re-expression of one collector pass (SURVEY.md §3.2, the
PolygonGroupedDailyCollector archetype at /root/reference/src/actions/
collect/polygon_grouped_daily.rs:141-220): checkpoint read -> budget
acquisition -> fetch loop -> transform -> dedup sink -> advance, but as one
declarative DataFrame plan per stage with a snapshot commit at the end.

Stages (all lazy until the writes):
 1. frontier_N scan (partition-pruned: one round=N directory)
 2. robots broadcast anti-filter             (warden, J6/R6)
 3. politeness wave pop, skew-salted window  (W1-W3, R1-R5)
 4. "fetch" = broadcast-join the wave against the pages corpus — the wave
    is bounded by sum(host budgets), so it broadcasts; the 100 TB side
    streams by with partition pruning on its (bucket(url), days(warc_ts))
    layout, never shuffling
 5. extract text + links, one Arrow pass     (S3/F12 + byte-identical rule)
 6. within-round dedup (groupBy url_sha1, deterministic min) then
    Bloom-prefiltered anti-join vs seen      (J5/S7)
 7. write fetch_log / pages_out / frontier_{N+1} / seen delta; update
    Bloom shards; commit metrics (D9 ExecutionStats analog)

The Bloom update lands *before* the manifest commit: a crash in between
leaves extra bits set, which only causes false positives — and every
positive is re-checked by the exact anti-join, so correctness holds.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_collector_spark.crawler.state import (
    FETCH_LOG_SCHEMA,
    FRONTIER_SCHEMA,
    CrawlState,
    RoundMetrics,
)
from data_collector_spark.functions.extract import with_extracted
from data_collector_spark.functions.urls import with_canonical_url
from data_collector_spark.operators.bloom import ShardedBloom
from data_collector_spark.operators.politeness import pop_wave
from data_collector_spark.operators.robots import split_robots
from data_collector_spark.operators.seen import dedup_against_seen

PAGES_OUT_SCHEMA = (
    "url_canon string, url_sha1 string, host string, depth int, seq_in_host int, "
    "warc_ts timestamp, extracted_text string, links array<string>"
)


def run_round(
    spark: SparkSession,
    state: CrawlState,
    pages: DataFrame,
    robots: DataFrame,
    budgets: DataFrame,
    bloom: ShardedBloom | None,
    round_n: int,
    default_budget: int = 2,
    skew_salt: int = 16,
    retry_max: int = 0,
    retry_backoff_base: int = 2,
) -> RoundMetrics:
    """Execute round N and write (but not commit) all round outputs.

    ``pages`` must carry url_canon, html, warc_ts, text, lang.
    """
    t0 = time.monotonic()
    m = RoundMetrics(round=round_n)
    _last = [t0]

    def mark(phase: str) -> None:
        now = time.monotonic()
        m.phase_sec[phase] = round(now - _last[0], 2)
        _last[0] = now

    frontier_n = state.read_round(spark, "frontier", round_n, FRONTIER_SCHEMA)
    # D6 backoff hold: entries whose retry window hasn't opened pass
    # through untouched (the reference sleeps between retries,
    # task.rs:277-329; executors never sleep — they defer)
    held = frontier_n.filter(F.col("not_before_round") > round_n)
    frontier_n = frontier_n.filter(F.col("not_before_round") <= round_n)
    # robots is a tiny config table; when empty, skip the whole branch
    # (saves one frontier-wide job per round)
    if robots.limit(1).count() > 0:
        allowed, blocked = split_robots(frontier_n, robots)
    else:
        allowed, blocked = frontier_n, None

    wave, deferred = pop_wave(allowed, budgets, default_budget, skew_salt)
    wave = wave.persist()
    m.robots_blocked = blocked.count() if blocked is not None else 0
    mark("pop_wave")

    # fetch + extract, one Arrow pass, written once and re-read for fan-out.
    # The hits set is budget-bounded, so repartitioning it is cheap and
    # guarantees the extract UDF parallelizes even when the pages scan
    # produced few splits (small-file corpora) or the join preserved a
    # narrow partitioning.
    hits = pages.join(
        F.broadcast(wave.select("url_canon", "url_sha1", "host", "depth", "seq_in_host")),
        "url_canon",
        "inner",
    )
    # extraction parallelism rides on the pages-scan splits (session sets
    # 16 MB maxPartitionBytes); only repartition — a full shuffle of the
    # html payloads — when the scan can't give one split per task slot
    if pages.rdd.getNumPartitions() < spark.sparkContext.defaultParallelism:
        hits = hits.repartition(
            2 * spark.sparkContext.defaultParallelism, "url_sha1"
        )
    # NOTE: with_extracted(canonicalize_links=True) would save one
    # JVM<->Python hop for the link fan-out, but measured SLOWER at 8
    # cores (pandas list-rebuild cost > Arrow hop saved) — keep separate
    extracted = with_extracted(hits).select(
        "url_canon", "url_sha1", "host", "depth", "seq_in_host",
        "warc_ts", "extracted_text", "links",
    )
    state.write_round("pages_out", round_n, extracted)
    fetched = state.read_round(spark, "pages_out", round_n, PAGES_OUT_SCHEMA)
    stats = fetched.agg(
        F.count("*").alias("n"),
        F.coalesce(F.sum(F.size("links")), F.lit(0)).alias("links"),
    ).collect()[0]
    m.fetched = stats["n"]
    m.links_extracted = int(stats["links"])
    mark("fetch_extract")

    # fetch_log: per-host ordering lineage (replay-equivalence invariant)
    dead = wave.join(F.broadcast(fetched.select("url_sha1")), "url_sha1", "left_anti")
    log = (
        fetched.select("url_canon", "url_sha1", "host", "seq_in_host")
        .withColumn("status", F.lit("fetched"))
        .unionByName(
            dead.select("url_canon", "url_sha1", "host", "seq_in_host").withColumn(
                "status", F.lit("dead")
            )
        )
    )
    if blocked is not None:
        log = log.unionByName(
            blocked.select("url_canon", "url_sha1", "host")
            .withColumn("seq_in_host", F.lit(None).cast("int"))
            .withColumn("status", F.lit("robots")),
        )
    state.write_round("fetch_log", round_n, log)
    m.dead = wave.count() - m.fetched
    # D6: re-enqueue dead URLs with exponential round backoff
    retries = None
    if retry_max > 0:
        retries = (
            dead.filter(F.col("attempt") < retry_max)
            .withColumn("attempt", F.col("attempt") + 1)
            .withColumn(
                "not_before_round",
                F.lit(round_n)
                + F.pow(F.lit(retry_backoff_base), F.col("attempt") - 1).cast("int"),
            )
            .drop("seq_in_host", "_budget")
        )
    mark("fetch_log")

    # link extraction -> next-generation candidates
    links = fetched.select(
        F.col("depth").alias("parent_depth"),
        F.col("warc_ts").alias("parent_ts"),
        F.explode("links").alias("url"),
    )
    cand = with_canonical_url(links, "url")
    # within-round dedup: deterministic min over (depth, ts) per key (J5);
    # persisted because the Bloom split consumes it twice (definitely-new
    # branch + suspects branch) — without the cache the canonicalize UDF
    # chain would run once per branch
    cand_unique = (
        cand.groupBy("url_sha1")
        .agg(
            F.min(F.struct("parent_depth", "parent_ts", "url_canon")).alias("_m"),
        )
        .select(
            F.col("_m.url_canon").alias("url_canon"),
            "url_sha1",
            (F.col("_m.parent_depth") + 1).alias("depth"),
            F.col("_m.parent_ts").alias("discovery_ts"),
        )
        .withColumn("host", F.regexp_extract("url_canon", r"^[a-z0-9+.\-]+://([^/:?#]+)", 1))
        .withColumn("priority", F.lit(1))
        .withColumn("attempt", F.lit(0))
        .withColumn("not_before_round", F.lit(round_n + 1))
        .persist()
    )
    seen_all = state.read_all(spark, "seen")
    new_entries = dedup_against_seen(
        spark, cand_unique, seen_all.select("url_sha1") if seen_all is not None else None, bloom
    ).persist()

    frontier_cols = [
        "url_canon", "url_sha1", "host", "depth", "discovery_ts",
        "priority", "attempt", "not_before_round",
    ]
    frontier_next = deferred.select(*frontier_cols).unionByName(
        new_entries.select(*frontier_cols)
    ).unionByName(held.select(*frontier_cols))
    if retries is not None:
        frontier_next = frontier_next.unionByName(retries.select(*frontier_cols))
    state.write_round("frontier", round_n + 1, frontier_next)
    mark("frontier_write")
    state.write_round("seen", round_n + 1, new_entries.select("url_sha1", "url_canon"))
    mark("seen_write")

    seen_delta = state.read_round(spark, "seen", round_n + 1, "url_sha1 string, url_canon string")
    m.enqueued = seen_delta.count()
    uniq = cand_unique.count()
    m.deduped = uniq - m.enqueued
    m.held_by_backoff = held.count()
    m.retried = retries.count() if retries is not None else 0
    frontier_total = state.read_round(spark, "frontier", round_n + 1, FRONTIER_SCHEMA).count()
    m.deferred_by_politeness = (
        frontier_total - m.enqueued - m.held_by_backoff - m.retried
    )

    mark("counters")
    if bloom is not None:
        if m.enqueued:
            bloom.add_df(seen_delta)
        bloom.save(state.bloom_dir())
    mark("bloom")

    # per-partition lineage: fetched rows per host (bounded: top 50)
    top = (
        fetched.groupBy("host").count().orderBy(F.desc("count"), "host").limit(50).collect()
    )
    m.per_partition = {r["host"]: r["count"] for r in top}

    wave.unpersist()
    cand_unique.unpersist()
    new_entries.unpersist()
    m.wall_sec = round(time.monotonic() - t0, 3)
    return m
