"""Stale re-crawl — the warden TTL re-check.

The reference re-checks wardened symbols after 30 idle days
(/root/reference/src/database/warden_service.rs:103-121) and detects
stale series with ``GROUP BY symbol HAVING max(business_date) < cutoff``
(/root/reference/src/actions/collect/polygon_open_close.rs:244-255,
SURVEY.md A4/R6). Crawler analog: pages whose last successful fetch is
older than ``ttl_rounds`` get re-enqueued at a lower priority, bypassing
the seen-set (seen only guards *discovery*; frontier membership is what
schedules fetches).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

LAST_FETCH_SCHEMA = "url_sha1 string, url_canon string, host string, last_round int"


def merge_last_fetch(
    prev: DataFrame | None, fetched_log: DataFrame, round_n: int
) -> DataFrame:
    """Running (url, last_fetch_round) state: previous table coalesce-merged
    with round N's successful fetches (S8 upsert shape, /root/reference/src/
    actions/stage/nyse_instruments.rs:79-117).

    One bounded distributed rewrite per round — O(|fetched urls|) — instead
    of the r2 pattern of re-scanning the ENTIRE fetch_log history every
    round (O(rounds) listing + scan growth). At cluster scale this merge is
    an Iceberg/Delta MERGE INTO on url_sha1; the parquet twin rewrites the
    (single) round-partition and prunes the predecessor after commit.
    """
    cur = fetched_log.filter(F.col("status") == "fetched").select(
        "url_sha1", "url_canon", "host", F.lit(round_n).alias("last_round")
    )
    if prev is None:
        return cur
    # a url refetched in round N moves forward; max_by keeps the newest
    return (
        prev.unionByName(cur)
        .groupBy("url_sha1")
        .agg(F.max_by(F.struct("url_canon", "host", "last_round"), "last_round").alias("_u"))
        .select(
            "url_sha1",
            F.col("_u.url_canon").alias("url_canon"),
            F.col("_u.host").alias("host"),
            F.col("_u.last_round").alias("last_round"),
        )
    )


def stale_recrawl_candidates(
    last_fetch: DataFrame,
    frontier_next: DataFrame,
    current_round: int,
    ttl_rounds: int,
    priority: int = 2,
) -> DataFrame:
    """Frontier entries for URLs last fetched <= current_round - ttl_rounds.

    A4/R6 shape (warden TTL, /root/reference/src/database/warden_service.rs:
    103-121): filter the running last-fetch table by the cutoff. URLs
    already queued in frontier_next are excluded (no double-scheduling).
    """
    stale = last_fetch.filter(F.col("last_round") <= current_round - ttl_rounds)
    fresh = stale.select(
        "url_canon",
        "url_sha1",
        "host",
        F.lit(0).alias("depth"),
        F.lit("2024-01-01").cast("timestamp").alias("discovery_ts"),
        F.lit(priority).alias("priority"),
        F.lit(0).alias("attempt"),
        F.lit(current_round + 1).alias("not_before_round"),
    )
    return fresh.join(frontier_next.select("url_sha1"), "url_sha1", "left_anti")
