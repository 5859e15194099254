"""robots.txt filter — the reference's warden blocklist, extended to
RFC 9309 Allow/Disallow precedence.

``source_symbol_warden`` marks symbols a source will never serve
(/root/reference/migrations/20240509031900_SOURCE_SYBMOL_WARDEN.sql:6-12,
src/database/warden_service.rs:70-121); collectors exclude them with
``NOT IN (SELECT unnest($1))`` (SURVEY.md J6/R6). Crawler analog: a tiny
(host, path_prefix, allow) rules table, aggregated to one array row per
host, broadcast-joined, and decided JVM-side with higher-order functions
— no UDF, no shuffle on the frontier side.

RFC 9309 §2.2.2 precedence: the rule whose path prefix has the LONGEST
match wins; on a length tie Allow wins. That makes the common large-site
idiom ``Disallow: /`` + ``Allow: /public`` work: /public/... matches the
7-char Allow over the 1-char Disallow. Plain blocklist tables without an
``allow`` column keep their old semantics (every rule a Disallow, ''
blocks the whole host) — the reference's warden is exactly that shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_RULES_T = "array<struct<prefix:string,allow:boolean>>"


def parse_robots_txt(
    robots_txt: DataFrame,
    host_col: str = "host",
    text_col: str = "robots_txt",
    agent: str = "*",
) -> DataFrame:
    """(host, robots_txt) -> the (host, path_prefix, allow) rules table
    that ``split_robots`` consumes — fetched robots.txt bodies become the
    rules without leaving the JVM.

    RFC 9309 grouping, implemented as ONE ``F.aggregate`` fold over the
    split lines (codegen; per-host robots.txt is small, so a per-row fold
    is the right shape — no explode/window/shuffle): consecutive
    ``User-agent:`` lines open a group; the group applies if any of its
    agents is ``*`` or equals ``agent`` (case-insensitive token match);
    ``Disallow:``/``Allow:`` lines inside an applying group contribute
    (prefix, allow) rules; empty values add nothing (empty Disallow means
    allow-all); comments (#) and unknown directives are ignored (unknown
    directives close the agent run like rules do). ``Disallow: /`` blocks
    the whole host unless a longer ``Allow:`` match wins (split_robots
    applies the longest-match precedence)."""
    lines = F.split(F.col(text_col), "\n")
    # accumulator: (in_agent_run, active, rules)
    init = F.struct(
        F.lit(False).alias("run"), F.lit(False).alias("act"),
        F.array().cast(_RULES_T).alias("acc"),
    )

    def step(acc, raw):
        line = F.trim(F.split(raw, "#")[0])  # strip comments + CR/space
        line = F.regexp_replace(line, "\r$", "")
        low = F.lower(line)
        is_ua = low.startswith("user-agent:")
        is_dis = low.startswith("disallow:")
        is_alw = low.startswith("allow:")
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
                is_dis | is_alw,
                F.struct(
                    F.lit(False).alias("run"),
                    acc["act"].alias("act"),
                    F.when(
                        acc["act"] & (value != ""),
                        F.array_append(
                            acc["acc"],
                            F.struct(
                                value.alias("prefix"), is_alw.alias("allow")
                            ),
                        ),
                    )
                    .otherwise(acc["acc"])
                    .alias("acc"),
                ),
            )
            .otherwise(  # other directive (Sitemap, Crawl-delay, …): ends UA run
                F.struct(
                    F.lit(False).alias("run"), acc["act"].alias("act"),
                    acc["acc"].alias("acc"),
                )
            )
        )

    rules = F.aggregate(lines, init, step, lambda acc: acc["acc"])
    return (
        robots_txt.select(F.col(host_col).alias("host"), rules.alias("_r"))
        .select("host", F.explode("_r").alias("_rule"))
        .select(
            "host",
            F.col("_rule.prefix").alias("path_prefix"),
            F.col("_rule.allow").alias("allow"),
        )
    )


def sitemaps_from_robots(
    robots_txt: DataFrame, host_col: str = "host", text_col: str = "robots_txt"
) -> DataFrame:
    """(host, robots_txt) -> (host, sitemap_url): the ``Sitemap:``
    directives (RFC 9309 §2.3 treats them as host-global, outside any
    user-agent group — so this is a flat codegen regexp over the body, no
    fold needed). Feed the urls to the crawl as seeds and, once fetched,
    the bodies to ``sources.sitemap.seeds_from_sitemaps(corpus=...)`` —
    robots.txt -> sitemap index -> urlset -> frontier is the standard
    crawl bootstrap chain."""
    locs = F.regexp_extract_all(
        text_col, F.lit(r"(?im)^\s*sitemap\s*:\s*(\S+)\s*$"), 1
    )
    return (
        robots_txt.select(F.col(host_col).alias("host"), F.explode(locs).alias("sitemap_url"))
        .filter(F.col("sitemap_url") != "")
        .distinct()
    )


def split_robots(
    frontier: DataFrame, robots: DataFrame, broadcast: bool = True
) -> tuple[DataFrame, DataFrame]:
    """-> (allowed, blocked) by RFC 9309 longest-match precedence.

    ``robots`` is (host, path_prefix[, allow]); a missing ``allow`` column
    means every rule is a Disallow (the reference's warden blocklist
    shape, and the engine's pre-r4 semantics — '' blocks the whole host).
    frontier needs url_canon + host columns. The longest matching prefix
    decides; a length tie goes to Allow; no match allows.

    ``broadcast`` gates the per-host rules broadcast the same way the
    engine gates its wave/fetched broadcasts: the rules table is O(hosts)
    and at web scale (10^8 hosts x parsed rule arrays) a multi-GB
    unconditional broadcast OOMs executors — above the driver's threshold
    (CrawlConfig.robots_broadcast_max_rows, decided ONCE per crawl from
    the rule count) the join runs as a plain shuffle join on host
    instead. Semantics are identical either way
    (test_robots.py::test_shuffle_mode_matches_broadcast_mode).
    """
    if "allow" not in robots.columns:
        robots = robots.withColumn("allow", F.lit(False))
    rules = robots.groupBy("host").agg(
        F.collect_list(
            F.struct(
                F.col("path_prefix").alias("prefix"), F.col("allow").alias("allow")
            )
        ).alias("_rules")
    )
    path = F.regexp_extract("url_canon", r"^[a-z0-9+.\-]+://[^/?#]+(/[^?#]*)?", 1)
    # winner = max over matching rules of (prefix_length, allow): struct
    # ordering compares length first, then allow (true > false on ties)
    matching = F.filter(
        F.col("_rules"), lambda r: F.col("_path").startswith(r["prefix"])
    )
    best = F.array_max(
        F.transform(
            matching,
            lambda r: F.struct(
                F.length(r["prefix"]).alias("l"), r["allow"].alias("a")
            ),
        )
    )
    joined = (
        frontier.join(F.broadcast(rules) if broadcast else rules, "host", "left")
        .withColumn("_path", F.coalesce(path, F.lit("/")))
        .withColumn(
            "_blocked",
            F.col("_rules").isNotNull() & best.isNotNull() & ~best["a"],
        )
    )
    allowed = joined.filter(~F.col("_blocked")).drop("_rules", "_path", "_blocked")
    blocked = joined.filter(F.col("_blocked")).drop("_rules", "_path", "_blocked")
    return allowed, blocked
