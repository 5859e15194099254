"""robots.txt disallow filter — the reference's warden blocklist.

``source_symbol_warden`` marks symbols a source will never serve
(/root/reference/migrations/20240509031900_SOURCE_SYBMOL_WARDEN.sql:6-12,
src/database/warden_service.rs:70-121); collectors exclude them with
``NOT IN (SELECT unnest($1))`` (SURVEY.md J6/R6). Crawler analog: a tiny
(host, path_prefix) disallow table, aggregated to one array row per host,
broadcast-joined, and checked JVM-side with ``exists()`` — no UDF, no
shuffle on the frontier side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def split_robots(frontier: DataFrame, robots: DataFrame) -> tuple[DataFrame, DataFrame]:
    """-> (allowed, blocked). '' prefix blocks the whole host.

    frontier needs url_canon + host columns.
    """
    rules = robots.groupBy("host").agg(F.collect_list("path_prefix").alias("_prefixes"))
    path = F.regexp_extract("url_canon", r"^[a-z0-9+.\-]+://[^/?#]+(/[^?#]*)?", 1)
    joined = frontier.join(F.broadcast(rules), "host", "left").withColumn(
        "_path", F.coalesce(path, F.lit("/"))
    )
    blocked_pred = F.col("_prefixes").isNotNull() & F.exists(
        "_prefixes",
        lambda p: (p == F.lit("")) | F.col("_path").startswith(p),
    )
    allowed = joined.filter(~blocked_pred).drop("_prefixes", "_path")
    blocked = joined.filter(blocked_pred).drop("_prefixes", "_path")
    return allowed, blocked
