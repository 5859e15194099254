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


def stale_recrawl_candidates(
    fetch_log: DataFrame,
    frontier_next: DataFrame,
    current_round: int,
    ttl_rounds: int,
    priority: int = 2,
) -> DataFrame:
    """Frontier entries for URLs last fetched <= current_round - ttl_rounds.

    A4 shape: groupBy key -> max(round) -> HAVING max < cutoff. URLs
    already queued in frontier_next are excluded (no double-scheduling).
    """
    last = (
        fetch_log.filter(F.col("status") == "fetched")
        .groupBy("url_sha1")
        .agg(
            F.max("round").alias("last_round"),
            F.min(F.struct("url_canon", "host")).alias("_u"),
        )
        .filter(F.col("last_round") <= current_round - ttl_rounds)
    )
    fresh = last.select(
        F.col("_u.url_canon").alias("url_canon"),
        "url_sha1",
        F.col("_u.host").alias("host"),
        F.lit(0).alias("depth"),
        F.lit("2024-01-01").cast("timestamp").alias("discovery_ts"),
        F.lit(priority).alias("priority"),
        F.lit(0).alias("attempt"),
        F.lit(current_round + 1).alias("not_before_round"),
    )
    return fresh.join(frontier_next.select("url_sha1"), "url_sha1", "left_anti")
