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


def parse_robots_txt(
    robots_txt: DataFrame,
    host_col: str = "host",
    text_col: str = "robots_txt",
    agent: str = "*",
) -> DataFrame:
    """(host, robots_txt) -> the (host, path_prefix) rules table that
    ``split_robots`` consumes — fetched robots.txt bodies become the
    blocklist without leaving the JVM.

    Simplified RFC 9309 grouping, implemented as ONE ``F.aggregate`` fold
    over the split lines (codegen; per-host robots.txt is small, so a
    per-row fold is the right shape — no explode/window/shuffle):
    consecutive ``User-agent:`` lines open a group; the group applies if
    any of its agents is ``*`` or equals ``agent`` (case-insensitive
    token match); ``Disallow:`` lines inside an applying group contribute
    their path prefix; empty ``Disallow:`` means allow-all and adds
    nothing; comments (#) and unknown directives are ignored (unknown
    directives close the agent run like rules do). ``Disallow: /`` blocks
    the whole host (every path startswith '/')."""
    lines = F.split(F.col(text_col), "\n")
    # accumulator: (in_agent_run, active, prefixes)
    init = F.struct(
        F.lit(False).alias("run"), F.lit(False).alias("act"),
        F.array().cast("array<string>").alias("acc"),
    )

    def step(acc, raw):
        line = F.trim(F.split(raw, "#")[0])  # strip comments + CR/space
        line = F.regexp_replace(line, "\r$", "")
        low = F.lower(line)
        is_ua = low.startswith("user-agent:")
        is_dis = low.startswith("disallow:")
        # value = everything after the FIRST colon (paths may contain ':')
        value = F.trim(F.regexp_replace(line, "^[^:]*:", ""))
        ua_match = (value == F.lit("*")) | (F.lower(value) == F.lit(agent.lower()))
        return (
            F.when(line == "", acc)  # blank lines don't end a group
            .when(
                is_ua,
                F.struct(
                    F.lit(True).alias("run"),
                    # first UA of a run resets 'active'; later UAs OR in
                    F.when(acc["run"], acc["act"] | ua_match)
                    .otherwise(ua_match)
                    .alias("act"),
                    acc["acc"].alias("acc"),
                ),
            )
            .when(
                is_dis,
                F.struct(
                    F.lit(False).alias("run"),
                    acc["act"].alias("act"),
                    F.when(
                        acc["act"] & (value != ""),
                        F.array_append(acc["acc"], value),
                    )
                    .otherwise(acc["acc"])
                    .alias("acc"),
                ),
            )
            .otherwise(  # other directive (Allow, Sitemap, …): ends UA run
                F.struct(
                    F.lit(False).alias("run"), acc["act"].alias("act"),
                    acc["acc"].alias("acc"),
                )
            )
        )

    prefixes = F.aggregate(lines, init, step, lambda acc: acc["acc"])
    return (
        robots_txt.select(F.col(host_col).alias("host"), prefixes.alias("_p"))
        .select("host", F.explode("_p").alias("path_prefix"))
    )


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
