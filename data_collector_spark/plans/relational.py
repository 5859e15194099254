"""SURVEY.md §2 relational operator inventory over the testdata tables.

Each query names the operator row(s) it covers (P/F/J/A/W/U/S) and cites
the reference behavior it re-expresses. Numeric discipline for the DuckDB
value-hash comparison: exact sums via DECIMAL accumulation cast back to
DOUBLE; averages rounded; int-ish outputs cast to BIGINT on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_collector_spark.operators.merge import merge_upsert
from data_collector_spark.plans.registry import query
from data_collector_spark.sources.tables import load_table


def _t(spark: SparkSession, sf: str, name: str) -> DataFrame:
    return load_table(spark, sf, name)


# ---------------------------------------------------------------------------
# Aggregation / filter archetype
# ---------------------------------------------------------------------------
@query(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
           round(avg(l_quantity), 4) AS avg_qty,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark, sf):
    """Flagship scan->filter->agg (A-class; P1 date filter).

    Analog: per-round counters over time-windowed raw tables
    (/root/reference/src/actions/collect/nyse_events.rs:296-318)."""
    li = _t(spark, sf, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double").alias("sum_base_price"),
            F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# P: projections / filters
# ---------------------------------------------------------------------------
@query(
    "p1_validity_filter",
    """
    SELECT l_orderkey, l_linenumber, l_shipdate
    FROM lineitem
    WHERE l_returnflag IS NOT NULL AND l_linestatus IS NOT NULL
      AND l_shipdate <= TIMESTAMP '1997-01-01 00:00:00'
    """,
)
def p1_validity_filter(spark, sf):
    """P1: NULL-validity + date-cutoff filter
    (/root/reference/src/actions/collect/nyse_events.rs:209-226)."""
    li = _t(spark, sf, "lineitem")
    return li.filter(
        F.col("l_returnflag").isNotNull()
        & F.col("l_linestatus").isNotNull()
        & (F.col("l_shipdate") <= F.lit("1997-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_linenumber", "l_shipdate")


@query(
    "p4_flag_update",
    """
    SELECT event_id,
           CASE WHEN event_type = 'error' THEN TRUE ELSE FALSE END AS is_staged
    FROM events
    """,
)
def p4_flag_update(spark, sf):
    """P4: filter-on-flag update semantics (UPDATE ... WHERE type='TEST',
    /root/reference/src/actions/stage/nyse_instruments.rs:100-110)."""
    ev = _t(spark, sf, "events")
    return ev.select(
        "event_id",
        F.when(F.col("event_type") == "error", F.lit(True))
        .otherwise(F.lit(False))
        .alias("is_staged"),
    )


@query(
    "p6_case_routing",
    """
    SELECT c_custkey,
           CASE WHEN c_mktsegment = 'BUILDING'   THEN 'b'
                WHEN c_mktsegment = 'AUTOMOBILE' THEN 'a'
                WHEN c_mktsegment = 'MACHINERY'  THEN 'm'
                WHEN c_mktsegment = 'HOUSEHOLD'  THEN 'h'
                WHEN c_mktsegment = 'FURNITURE'  THEN 'f'
                ELSE 'x' END AS route
    FROM customer
    """,
)
def p6_case_routing(spark, sf):
    """F6: 8-way CASE WHEN routing (mic_code routing,
    /root/reference/src/actions/stage/nyse_instruments.rs:122-130)."""
    c = _t(spark, sf, "customer")
    return c.select(
        "c_custkey",
        F.when(F.col("c_mktsegment") == "BUILDING", "b")
        .when(F.col("c_mktsegment") == "AUTOMOBILE", "a")
        .when(F.col("c_mktsegment") == "MACHINERY", "m")
        .when(F.col("c_mktsegment") == "HOUSEHOLD", "h")
        .when(F.col("c_mktsegment") == "FURNITURE", "f")
        .otherwise("x")
        .alias("route"),
    )


# ---------------------------------------------------------------------------
# F: scalar functions
# ---------------------------------------------------------------------------
@query(
    "f1_key_normalization",
    """
    SELECT p_partkey, replace(p_type, 'O', '-') AS norm_type
    FROM part
    """,
)
def f1_key_normalization(spark, sf):
    """F1: join-key normalization replace()
    (/root/reference/src/actions/stage/nyse_instruments.rs:135,149,175)."""
    p = _t(spark, sf, "part")
    return p.select(
        "p_partkey", F.regexp_replace("p_type", "O", "-").alias("norm_type")
    )


@query(
    "f3_year_month",
    """
    SELECT o_orderkey,
           CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT) AS year_month
    FROM orders
    """,
)
def f3_year_month(spark, sf):
    """F3: derived partition key EXTRACT(YEAR)*100+MONTH
    (/root/reference/src/actions/stage/polygon_grouped_daily.rs:296)."""
    o = _t(spark, sf, "orders")
    return o.select(
        "o_orderkey",
        (F.year("o_orderdate") * 100 + F.month("o_orderdate"))
        .cast("long")
        .alias("year_month"),
    )


@query(
    "f5_coalesce_first",
    """
    SELECT o_orderkey,
           coalesce(nullif(o_orderstatus, 'O'), nullif(o_orderpriority, '5-LOW'), 'none') AS first_non_default
    FROM orders
    """,
)
def f5_coalesce_first(spark, sf):
    """F5: first-non-null coalesce chain (concat-of-8-dates trick,
    /root/reference/src/actions/collect/financialmodelingprep_market_capitalization.rs:277-290)."""
    o = _t(spark, sf, "orders")
    return o.select(
        "o_orderkey",
        F.coalesce(
            F.nullif(F.col("o_orderstatus"), F.lit("O")),
            F.nullif(F.col("o_orderpriority"), F.lit("5-LOW")),
            F.lit("none"),
        ).alias("first_non_default"),
    )


@query(
    "f7_date_arith",
    """
    SELECT o_orderkey,
           CAST(CAST(o_orderdate AS DATE) + 7 AS TIMESTAMP) AS plus_week,
           CAST(CAST(CAST(o_orderdate AS DATE) - INTERVAL 24 MONTH AS DATE) AS TIMESTAMP) AS back_24m
    FROM orders
    """,
)
def f7_date_arith(spark, sf):
    """F7: +7 days / -24 months date arithmetic
    (/root/reference/src/actions/collect/nyse_events.rs:158-160,
    polygon_grouped_daily.rs:265-273)."""
    o = _t(spark, sf, "orders")
    d = F.col("o_orderdate").cast("date")
    # date outputs cast to timestamp: unambiguous across Spark/DuckDB/Arrow
    return o.select(
        "o_orderkey",
        F.date_add(d, 7).cast("timestamp").alias("plus_week"),
        F.add_months(d, -24).cast("timestamp").alias("back_24m"),
    )


@query(
    "f8_pages_available",
    """
    SELECT user_id, CAST(ceil(count(*) / 10.0) AS BIGINT) AS pages_available
    FROM events GROUP BY user_id
    """,
)
def f8_pages_available(spark, sf):
    """F8: pages_available = ceil(count/page_size)
    (/root/reference/src/utils/action_helpers.rs:22-24)."""
    ev = _t(spark, sf, "events")
    return ev.groupBy("user_id").agg(
        F.ceil(F.count("*") / 10.0).cast("long").alias("pages_available")
    )


@query(
    "f9_json_extract",
    """
    SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
    FROM events
    """,
)
def f9_json_extract(spark, sf):
    """F9: JSON parse into typed columns
    (/root/reference/src/utils/action_helpers.rs:5-19)."""
    ev = _t(spark, sf, "events")
    return ev.select(
        "event_id", F.get_json_object("props", "$.k").cast("long").alias("k")
    )


@query(
    "f10_parse_date",
    """
    SELECT o_orderkey,
           strptime(strftime(o_orderdate, '%Y-%m-%d'), '%Y-%m-%d') AS rt_date
    FROM orders
    """,
)
def f10_parse_date(spark, sf):
    """F10: string->date parse '%Y-%m-%d'
    (/root/reference/src/actions/collect/nyse_events.rs:202-205)."""
    o = _t(spark, sf, "orders")
    return o.select(
        "o_orderkey",
        F.to_date(F.date_format("o_orderdate", "yyyy-MM-dd"), "yyyy-MM-dd")
        .cast("timestamp")
        .alias("rt_date"),
    )


@query(
    "f11_try_cast_int",
    """
    SELECT c_custkey,
           try_cast(regexp_extract(c_name, '([0-9]+)', 1) AS BIGINT) AS name_num,
           try_cast(c_mktsegment AS BIGINT) AS seg_num
    FROM customer
    """,
)
def f11_try_cast_int(spark, sf):
    """F11: string->int parse, NULL on failure
    (/root/reference/src/actions/collect/sec_companies.rs:293-299)."""
    c = _t(spark, sf, "customer")
    # try_cast: Spark 4 runs ANSI mode, plain cast raises on bad input
    return c.select(
        "c_custkey",
        F.regexp_extract("c_name", "([0-9]+)", 1).try_cast("long").alias("name_num"),
        F.col("c_mktsegment").try_cast("long").alias("seg_num"),
    )


@query(
    "f12_explode_words",
    """
    SELECT w AS word, count(*) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
    WHERE w <> ''
    GROUP BY w
    """,
)
def f12_explode_words(spark, sf):
    """F12: array explode, one row per element (tickers explode,
    /root/reference/src/actions/collect/sec_companies.rs:288-313) — the
    crawler's link-extraction explode."""
    d = _t(spark, sf, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )


@query(
    "f13_zero_imputation",
    """
    SELECT event_id,
           CASE WHEN value IS NULL AND user_id = 0 THEN 0.0 ELSE value END AS value_imputed
    FROM events
    """,
)
def f13_zero_imputation(spark, sf):
    """F13: pairwise (NULL,0)->(0,0) imputation
    (/root/reference/src/actions/stage/polygon_grouped_daily.rs:51-67)."""
    ev = _t(spark, sf, "events")
    return ev.select(
        "event_id",
        F.when(F.col("value").isNull() & (F.col("user_id") == 0), F.lit(0.0))
        .otherwise(F.col("value"))
        .alias("value_imputed"),
    )


@query(
    "f16_content_hash",
    """
    SELECT doc_id, sha256(text) AS text_sha
    FROM documents
    """,
)
def f16_content_hash(spark, sf):
    """F16: content hashing for URL-seen keys (engine uses sha1; oracle
    checks the sibling sha256 since DuckDB 1.0 lacks sha1)."""
    d = _t(spark, sf, "documents")
    return d.select("doc_id", F.sha2("text", 256).alias("text_sha"))


# ---------------------------------------------------------------------------
# Composed scalar-function suites — one driver CORRECTNESS row covering
# several §2 F-rows each (VERDICT r2 task 1: fit the 50-row budget without
# dropping operator coverage). The fine-grained single-operator queries
# above stay registered for the local parity mirror; only these composed
# forms are exported to the driver.
# ---------------------------------------------------------------------------
@query(
    "f_dates_suite",
    """
    SELECT o_orderkey,
           CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT) AS year_month,
           coalesce(nullif(o_orderstatus, 'O'), nullif(o_orderpriority, '5-LOW'), 'none') AS first_non_default,
           CAST(CAST(o_orderdate AS DATE) + 7 AS TIMESTAMP) AS plus_week,
           CAST(CAST(CAST(o_orderdate AS DATE) - INTERVAL 24 MONTH AS DATE) AS TIMESTAMP) AS back_24m,
           strptime(strftime(o_orderdate, '%Y-%m-%d'), '%Y-%m-%d') AS rt_date
    FROM orders
    """,
)
def f_dates_suite(spark, sf):
    """F3+F5+F7+F10 in one scan: derived partition key, first-non-null
    chain, date arithmetic, string<->date round-trip (citations on the
    individual queries above)."""
    o = _t(spark, sf, "orders")
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        (F.year("o_orderdate") * 100 + F.month("o_orderdate"))
        .cast("long")
        .alias("year_month"),
        F.coalesce(
            F.nullif(F.col("o_orderstatus"), F.lit("O")),
            F.nullif(F.col("o_orderpriority"), F.lit("5-LOW")),
            F.lit("none"),
        ).alias("first_non_default"),
        F.date_add(d, 7).cast("timestamp").alias("plus_week"),
        F.add_months(d, -24).cast("timestamp").alias("back_24m"),
        F.to_date(F.date_format("o_orderdate", "yyyy-MM-dd"), "yyyy-MM-dd")
        .cast("timestamp")
        .alias("rt_date"),
    )


@query(
    "f_events_suite",
    """
    SELECT event_id, user_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           CASE WHEN value IS NULL AND user_id = 0 THEN 0.0 ELSE value END AS value_imputed,
           CAST(ceil(count(*) OVER (PARTITION BY user_id) / 10.0) AS BIGINT) AS pages_available
    FROM events
    """,
)
def f_events_suite(spark, sf):
    """F8+F9+F13 in one scan: ceil(n/page_size) pagination (as a per-key
    window), JSON parse into typed columns, pairwise zero imputation."""
    ev = _t(spark, sf, "events")
    w = Window.partitionBy("user_id")
    return ev.select(
        "event_id",
        "user_id",
        F.get_json_object("props", "$.k").cast("long").alias("k"),
        F.when(F.col("value").isNull() & (F.col("user_id") == 0), F.lit(0.0))
        .otherwise(F.col("value"))
        .alias("value_imputed"),
        F.ceil(F.count("*").over(w) / 10.0).cast("long").alias("pages_available"),
    )


@query(
    "f_strings_suite",
    """
    SELECT c_custkey,
           replace(c_name, '#', '-') AS norm_name,
           try_cast(regexp_extract(c_name, '([0-9]+)', 1) AS BIGINT) AS name_num,
           try_cast(c_mktsegment AS BIGINT) AS seg_num
    FROM customer
    """,
)
def f_strings_suite(spark, sf):
    """F1+F11 in one scan: replace() key normalization and try-cast->NULL
    string parsing."""
    c = _t(spark, sf, "customer")
    return c.select(
        "c_custkey",
        F.regexp_replace("c_name", "#", "-").alias("norm_name"),
        F.regexp_extract("c_name", "([0-9]+)", 1).try_cast("long").alias("name_num"),
        F.col("c_mktsegment").try_cast("long").alias("seg_num"),
    )


# ---------------------------------------------------------------------------
# J: joins
# ---------------------------------------------------------------------------
@query(
    "j1_inner_equijoin",
    """
    SELECT o.o_orderkey, c.c_name, o.o_totalprice
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_acctbal > 5000
    """,
)
def j1_inner_equijoin(spark, sf):
    """J1: inner equi-join + filter (mark-OTC join,
    /root/reference/src/actions/stage/sec_companies.rs:60-78)."""
    o = _t(spark, sf, "orders")
    c = _t(spark, sf, "customer").filter(F.col("c_acctbal") > 5000)
    return o.join(c, o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "c_name", "o_totalprice"
    )


@query(
    "j2_broadcast_dims",
    """
    SELECT r.r_name, count(*) AS n_customers,
           CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def j2_broadcast_dims(spark, sf):
    """J2: 3-table dimension lookup, explicitly broadcast (countries join,
    /root/reference/src/actions/stage/sec_companies.rs:82-95)."""
    c = _t(spark, sf, "customer")
    n = _t(spark, sf, "nation")
    r = _t(spark, sf, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count("*").alias("n_customers"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double").alias("total_bal"),
        )
    )


@query(
    "j3_semi_join",
    """
    SELECT o_orderkey, o_totalprice FROM orders o
    WHERE EXISTS (SELECT 1 FROM customer c
                  WHERE c.c_custkey = o.o_custkey AND c.c_mktsegment = 'BUILDING')
    """,
)
def j3_semi_join(spark, sf):
    """J3: left-semi mark-staged join
    (/root/reference/src/actions/stage/sec_companies.rs:99-116)."""
    o = _t(spark, sf, "orders")
    c = _t(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    return o.join(c, o.o_custkey == c.c_custkey, "left_semi").select(
        "o_orderkey", "o_totalprice"
    )


@query(
    "j4_expression_key_join",
    """
    SELECT c.c_custkey, n.n_name
    FROM customer c JOIN nation n
      ON replace(n.n_name, 'NATION_', '') = CAST(c.c_nationkey AS VARCHAR)
    """,
)
def j4_expression_key_join(spark, sf):
    """J4: expression-keyed join (replace(esignal,'/','-') = symbol,
    /root/reference/src/actions/stage/nyse_instruments.rs:121-142)."""
    c = _t(spark, sf, "customer")
    n = _t(spark, sf, "nation")
    return c.join(
        F.broadcast(n),
        F.regexp_replace(n.n_name, "NATION_", "") == c.c_nationkey.cast("string"),
    ).select("c_custkey", "n_name")


@query(
    "j5_anti_dedup_insert",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def j5_anti_dedup_insert(spark, sf):
    """J5: insert-select anti-dedup — the URL-seen anti-join
    (/root/reference/src/actions/stage/sec_companies.rs:52-56)."""
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "j6_blocklist_anti",
    """
    SELECT o_orderkey, o_orderpriority FROM orders
    WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
      AND o_custkey NOT IN (SELECT c_custkey FROM customer WHERE c_acctbal < 0)
    """,
)
def j6_blocklist_anti(spark, sf):
    """J6: NOT IN blocklist anti-joins (warden exclusion,
    /root/reference/src/actions/collect/financialmodelingprep_company_profile.rs:237-249)."""
    o = _t(spark, sf, "orders")
    blocked = _t(spark, sf, "customer").filter(F.col("c_acctbal") < 0).select("c_custkey")
    return (
        o.filter(~F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .join(F.broadcast(blocked), o.o_custkey == blocked.c_custkey, "left_anti")
        .select("o_orderkey", "o_orderpriority")
    )


@query(
    "j7_guarded_update_join",
    """
    SELECT l.l_orderkey, l.l_linenumber
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE NOT (l.l_discount IS NOT NULL AND o.o_totalprice IS NULL)
      AND l.l_quantity > 45
    """,
)
def j7_guarded_update_join(spark, sf):
    """J7: join + NOT(source-has-value AND target-missing) guard
    (/root/reference/src/actions/stage/polygon_grouped_daily.rs:492-517)."""
    li = _t(spark, sf, "lineitem")
    o = _t(spark, sf, "orders")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(
            ~(F.col("l_discount").isNotNull() & F.col("o_totalprice").isNull())
            & (F.col("l_quantity") > 45)
        )
        .select("l_orderkey", "l_linenumber")
    )


@query(
    "j8_partition_pruned_join",
    """
    SELECT l.l_orderkey, l.l_linenumber, o.o_orderdate
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE CAST(year(o.o_orderdate) * 100 + month(o.o_orderdate) AS BIGINT) = 199506
    """,
)
def j8_partition_pruned_join(spark, sf):
    """J8: join guarded by the derived partition key so the scan prunes
    (/root/reference/src/actions/stage/polygon_grouped_daily.rs:284-297)."""
    li = _t(spark, sf, "lineitem")
    o = _t(spark, sf, "orders").filter(
        (F.year("o_orderdate") * 100 + F.month("o_orderdate")).cast("long") == 199506
    )
    return li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey", "l_linenumber", "o_orderdate"
    )


@query(
    "j9_eligible_union_view",
    """
    SELECT c_custkey FROM customer c
    WHERE EXISTS (SELECT 1 FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
                  WHERE n.n_nationkey = c.c_nationkey AND r.r_name = 'ASIA')
    UNION
    SELECT c_custkey FROM customer WHERE c_acctbal > 9000
    """,
)
def j9_eligible_union_view(spark, sf):
    """J9: eligibility view = semi-joins UNION event-sourced members
    (/root/reference/migrations/20250210201500_MASTER_DATA_ELIGIBLE.sql:4-12)."""
    c = _t(spark, sf, "customer")
    n = _t(spark, sf, "nation")
    r = _t(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    asia_nations = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select("n_nationkey")
    eligible = c.join(
        F.broadcast(asia_nations), c.c_nationkey == asia_nations.n_nationkey, "left_semi"
    ).select("c_custkey")
    rich = c.filter(F.col("c_acctbal") > 9000).select("c_custkey")
    return eligible.unionByName(rich).dropDuplicates()


# ---------------------------------------------------------------------------
# A: aggregations
# ---------------------------------------------------------------------------
@query(
    "a1_max_checkpoint",
    """
    SELECT coalesce(max(o_orderdate), TIMESTAMP '2015-12-07 00:00:00') AS checkpoint
    FROM orders WHERE o_orderstatus = 'F'
    """,
)
def a1_max_checkpoint(spark, sf):
    """A1/A2: max() resume checkpoint with epoch default
    (/root/reference/src/actions/collect/nyse_events.rs:296-318)."""
    o = _t(spark, sf, "orders")
    return o.filter(F.col("o_orderstatus") == "F").agg(
        F.coalesce(F.max("o_orderdate"), F.lit("2015-12-07").cast("timestamp")).alias(
            "checkpoint"
        )
    )


@query(
    "a3_max_per_key",
    """
    SELECT user_id, max(ts) AS last_seen FROM events GROUP BY user_id
    """,
)
def a3_max_per_key(spark, sf):
    """A3: per-key checkpoint (per-host last-fetch analog,
    /root/reference/src/actions/collect/financialmodelingprep_market_capitalization.rs:259-267)."""
    return _t(spark, sf, "events").groupBy("user_id").agg(F.max("ts").alias("last_seen"))


@query(
    "a4_stale_key_having",
    """
    SELECT user_id, max(ts) AS last_seen, count(*) AS n
    FROM events GROUP BY user_id
    HAVING max(ts) < TIMESTAMP '2024-01-25 00:00:00' AND count(*) >= 2
    """,
)
def a4_stale_key_having(spark, sf):
    """A4: stale-key detection via GROUP BY ... HAVING on aggregates
    (/root/reference/src/actions/collect/polygon_open_close.rs:244-255)."""
    ev = _t(spark, sf, "events")
    return (
        ev.groupBy("user_id")
        .agg(F.max("ts").alias("last_seen"), F.count("*").alias("n"))
        .filter(
            (F.col("last_seen") < F.lit("2024-01-25").cast("timestamp"))
            & (F.col("n") >= 2)
        )
    )


@query(
    "a5_parity_membership",
    """
    SELECT user_id, count(*) AS n_signups
    FROM events WHERE event_type = 'signup'
    GROUP BY user_id HAVING count(*) % 2 = 1
    """,
)
def a5_parity_membership(spark, sf):
    """A5: event-sourced membership by count parity (sp500(cutoff) fn,
    /root/reference/migrations/20250201005200_SP500_LIST_ACTION.sql:10-22)."""
    ev = _t(spark, sf, "events").filter(F.col("event_type") == "signup")
    return (
        ev.groupBy("user_id")
        .agg(F.count("*").alias("n_signups"))
        .filter(F.col("n_signups") % 2 == 1)
    )


@query(
    "a7_distinct_keys",
    """
    SELECT DISTINCT event_type FROM events
    """,
)
def a7_distinct_keys(spark, sf):
    """A7: SELECT DISTINCT deduped key list
    (/root/reference/src/database/master_data_service.rs:58-75)."""
    return _t(spark, sf, "events").select("event_type").distinct()


# ---------------------------------------------------------------------------
# W: windows / priority pop
# ---------------------------------------------------------------------------
@query(
    "w1_wave_pop",
    """
    SELECT event_id, user_id, rn FROM (
      SELECT event_id, user_id,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events) t
    WHERE rn <= 3
    """,
)
def w1_wave_pop(spark, sf):
    """W1: per-key budgeted wave pop — the frontier cursor as a window
    (/root/reference/src/database/master_data_service.rs:77-90)."""
    ev = _t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("event_id", "user_id", "rn")
    )


@query(
    "w2_two_tier_priority",
    """
    SELECT event_id, user_id, tier FROM (
      SELECT event_id, user_id, tier,
             row_number() OVER (PARTITION BY user_id ORDER BY tier, ts, event_id) AS rn
      FROM (SELECT event_id, user_id, ts,
                   CASE WHEN event_type = 'purchase' THEN 0
                        WHEN event_type = 'signup' THEN 1
                        ELSE 2 END AS tier
            FROM events) s) t
    WHERE rn <= 2
    """,
)
def w2_two_tier_priority(spark, sf):
    """W2: tiered priority classes then recency inside the window
    (/root/reference/src/actions/collect/financialmodelingprep_market_capitalization.rs:293-354)."""
    ev = _t(spark, sf, "events").withColumn(
        "tier",
        F.when(F.col("event_type") == "purchase", 0)
        .when(F.col("event_type") == "signup", 1)
        .otherwise(2),
    )
    w = Window.partitionBy("user_id").orderBy("tier", "ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .select("event_id", "user_id", "tier")
    )


@query(
    "w3_sessionize",
    """
    SELECT user_id, session_id, count(*) AS n_events FROM (
      SELECT user_id,
             CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      FROM (SELECT user_id, ts, event_id,
                   CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                             IS NULL THEN 1
                        WHEN epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
                             > 3600000000 THEN 1
                        ELSE 0 END AS is_new
            FROM events) s) t
    GROUP BY user_id, session_id
    """,
)
def w3_sessionize(spark, sf):
    """Sessionization: lag + gap>1h cumulative sum (stream-window analog of
    the 7-day request windows, /root/reference/src/actions/collect/
    nyse_events.rs:104-115)."""
    ev = _t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # microsecond-exact gap so truncation can't disagree with the oracle;
    # parquet ts is TIMESTAMP_NTZ, unix_micros needs TIMESTAMP (UTC session)
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = us - F.lag(us).over(w)
    marked = ev.withColumn(
        "is_new",
        F.when(gap.isNull() | (gap > 3_600_000_000), 1).otherwise(0),
    )
    return (
        marked.withColumn(
            "session_id",
            F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .groupBy("user_id", "session_id")
        .agg(F.count("*").alias("n_events"))
    )


@query(
    "w4_daily_budget",
    """
    SELECT event_id, user_id, day, rn FROM (
      SELECT event_id, user_id,
             CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             row_number() OVER (PARTITION BY user_id, date_trunc('day', ts)
                                ORDER BY ts, event_id) AS rn
      FROM events) t
    WHERE rn <= 4
    """,
)
def w4_daily_budget(spark, sf):
    """R2: daily budget window — at most N requests per key per day with a
    reset at the day boundary (/root/reference/src/api_keys/api_key.rs:
    79-106,160-168: 250/day FMP keys, reset 19:00 UTC). The crawl engine's
    round-windowed variant is CrawlConfig.daily_budget/rounds_per_day."""
    ev = _t(spark, sf, "events")
    day = F.date_trunc("day", F.col("ts"))
    w = Window.partitionBy("user_id", day).orderBy("ts", "event_id")
    return (
        ev.withColumn("day", day)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 4)
        .select("event_id", "user_id", "day", "rn")
    )


@query(
    "w5_budget_pools",
    """
    SELECT event_id, user_id, rn, CAST(ceil(rn / 3.0) AS BIGINT) AS key_id
    FROM (SELECT event_id, user_id,
                 row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
          FROM events) t
    WHERE rn <= 6
    """,
)
def w5_budget_pools(spark, sf):
    """R4 key rotation as a windowed query (/root/reference/src/api_keys/
    key_manager.rs:25-49): two keys of 3 requests each per user — the first
    six requests per key-ordered window, tagged with which pool served
    them (drain pool 1, rotate on exhaustion). The crawl engine's live
    form is CrawlConfig.budget_pools (politeness.pop_wave_spec(pools=k))."""
    ev = _t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 6)
        .select(
            "event_id", "user_id", "rn",
            F.ceil(F.col("rn") / 3.0).cast("long").alias("key_id"),
        )
    )


@query(
    "j10_asof_join",
    """
    WITH snaps0 AS (
      SELECT user_id, ts, value, event_id FROM events WHERE event_id % 10 = 0
    ),
    snaps AS (
      SELECT user_id, ts, value FROM (
        SELECT user_id, ts, value,
               row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
        FROM snaps0) t
      WHERE rn = 1
    )
    SELECT e.event_id, e.user_id, s.ts AS snap_ts, s.value AS snap_value
    FROM events e
    ASOF LEFT JOIN snaps s ON e.user_id = s.user_id AND e.ts >= s.ts
    """,
)
def j10_asof_join(spark, sf):
    """J10: as-of join — for each event, the latest snapshot row (a
    deterministic event subsample) at-or-before its timestamp, per key.

    The reference has no as-of join (noted n/a in SURVEY §2.4); this is
    the composition pattern Spark lacks natively: union both sides tagged,
    ONE per-key ordered window carrying the snapshot forward with
    last_value(ignoreNulls) — a single shuffle on the join key, no range
    explosion. Skew note: the carried window sorts one partition per user
    key, so a pathologically hot key serializes in one task. The salt
    remedy mirrors the politeness pop (politeness.py stage 1): add
    time-bucket sub-keys — window over (user, bucket) carrying each
    bucket's last snapshot, then a tiny per-(user, bucket) boundary table
    (one row per bucket) carries state across buckets; both stages stay
    bounded at ~|key|/buckets rows. Not wired here because the frontier
    of a single user is bounded at current data — apply when key
    cardinality skews. Oracle: DuckDB's native ASOF LEFT JOIN.
    """
    ev = _t(spark, sf, "events")
    snaps = (
        ev.filter(F.col("event_id") % 10 == 0)
        .groupBy("user_id", "ts")
        .agg(F.max_by("value", "event_id").alias("snap_value"))
    )
    # tag 0 sorts snapshots before events at equal ts (ASOF >= includes ties)
    tagged = snaps.select(
        "user_id", "ts", F.lit(0).alias("_tag"),
        F.lit(None).cast("long").alias("event_id"),
        F.col("ts").alias("_snap_ts"), F.col("snap_value").alias("_snap_value"),
    ).unionByName(
        ev.select(
            "user_id", "ts", F.lit(1).alias("_tag"), "event_id",
            F.lit(None).cast("timestamp").alias("_snap_ts"),
            F.lit(None).cast(ev.schema["value"].dataType).alias("_snap_value"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "_tag", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = tagged.select(
        "*",
        F.last("_snap_ts", ignorenulls=True).over(w).alias("snap_ts"),
        F.last("_snap_value", ignorenulls=True).over(w).alias("snap_value"),
    )
    return carried.filter(F.col("_tag") == 1).select(
        "event_id", "user_id", "snap_ts", "snap_value"
    )


@query(
    "j11_range_join",
    """
    SELECT a.event_id AS a_id, b.event_id AS b_id, b.event_type AS b_type
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND b.ts > a.ts
     AND b.ts <= a.ts + INTERVAL 1 HOUR
    WHERE a.event_type = 'signup'
    """,
)
def j11_range_join(spark, sf):
    """Range join (events within 1 h after each signup, per user) — the
    bucketed form: both sides get an hour-bucket key, candidates come from
    equi-joins on (user, bucket) and (user, bucket+1) — every true pair's
    buckets differ by at most one — then the exact interval filter runs on
    the bounded candidate set. At 10^10 rows this is two hash joins
    instead of an inequality join's cross-product-per-key; the same
    bucket-then-verify rule as the LSH sketches. Oracle: DuckDB's native
    inequality join.
    """
    ev = _t(spark, sf, "events")
    bucket = (F.unix_micros(F.col("ts").cast("timestamp")) / 3_600_000_000).cast("long")
    a = (
        ev.filter(F.col("event_type") == "signup")
        .select(
            F.col("event_id").alias("a_id"), F.col("user_id").alias("u"),
            F.col("ts").alias("ta"), bucket.alias("ba"),
        )
        .select(
            "a_id", "u", "ta",
            F.explode(F.array(F.col("ba"), F.col("ba") + 1)).alias("bk"),
        )
    )
    b = ev.select(
        F.col("event_id").alias("b_id"), F.col("event_type").alias("b_type"),
        F.col("user_id").alias("u"), F.col("ts").alias("tb"), bucket.alias("bk"),
    )
    cand = a.join(b, ["u", "bk"])
    return (
        cand.filter(
            (F.col("tb") > F.col("ta"))
            & (F.col("tb") <= F.col("ta") + F.expr("INTERVAL 1 HOUR"))
        )
        .select("a_id", "b_id", "b_type")
    )


# ---------------------------------------------------------------------------
# U/S: set ops + idempotent-insert semantics
# ---------------------------------------------------------------------------
@query(
    "u1_union_distinct",
    """
    SELECT event_id FROM events WHERE event_type = 'purchase'
    UNION
    SELECT event_id FROM events WHERE value > 90
    """,
)
def u1_union_distinct(spark, sf):
    """U1: UNION of eligibility sets
    (/root/reference/migrations/20250210201500_MASTER_DATA_ELIGIBLE.sql:9-12)."""
    ev = _t(spark, sf, "events")
    a = ev.filter(F.col("event_type") == "purchase").select("event_id")
    b = ev.filter(F.col("value") > 90).select("event_id")
    return a.unionByName(b).dropDuplicates()


@query(
    "u2_except",
    """
    SELECT p_brand FROM part
    EXCEPT
    SELECT p_brand FROM part WHERE p_size < 30
    """,
)
def u2_except(spark, sf):
    """U2: set difference (HashSet::difference for new partitions,
    /root/reference/src/actions/stage/polygon_grouped_daily.rs:324-326)."""
    p = _t(spark, sf, "part")
    # subtract == EXCEPT DISTINCT (exceptAll would keep surviving multiplicity)
    return p.select("p_brand").subtract(p.filter(F.col("p_size") < 30).select("p_brand"))


_PIVOT_TYPES = ("click", "view", "purchase", "signup", "error")


@query(
    "set_ops_suite",
    """
    SELECT 'union' AS src, CAST(event_id AS VARCHAR) AS key,
           CAST(NULL AS BIGINT) AS n_click, CAST(NULL AS BIGINT) AS n_view,
           CAST(NULL AS BIGINT) AS n_purchase, CAST(NULL AS BIGINT) AS n_signup,
           CAST(NULL AS BIGINT) AS n_error
    FROM (SELECT event_id FROM events WHERE event_type = 'purchase'
          UNION
          SELECT event_id FROM events WHERE value > 90) u
    UNION ALL
    SELECT 'except', p_brand,
           CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
           CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
    FROM (SELECT p_brand FROM part
          EXCEPT
          SELECT p_brand FROM part WHERE p_size < 30) e
    UNION ALL
    SELECT 'pivot', CAST(user_id AS VARCHAR),
           count(*) FILTER (WHERE event_type = 'click'),
           count(*) FILTER (WHERE event_type = 'view'),
           count(*) FILTER (WHERE event_type = 'purchase'),
           count(*) FILTER (WHERE event_type = 'signup'),
           count(*) FILTER (WHERE event_type = 'error')
    FROM events GROUP BY user_id
    """,
)
def set_ops_suite(spark, sf):
    """Composed driver row: U1 UNION-distinct + U2 EXCEPT + the pivot
    (conditional-aggregation) shape in one result, tagged by ``src`` —
    three branch plans, zero shared shuffles, one value-hashed oracle.
    Folding U1/U2 here freed a slot in the 50-entry driver surface for
    ``w5_budget_pools`` (VERDICT r3 stretch); the fine-grained originals
    (u1_union_distinct / u2_except / pivot_event_type_counts) stay
    registered for the local parity mirror."""
    ev = _t(spark, sf, "events")
    p = _t(spark, sf, "part")
    nulls = [F.lit(None).cast("long").alias(f"n_{t}") for t in _PIVOT_TYPES]
    u1 = (
        ev.filter(F.col("event_type") == "purchase").select("event_id")
        .unionByName(ev.filter(F.col("value") > 90).select("event_id"))
        .dropDuplicates()
        .select(
            F.lit("union").alias("src"),
            F.col("event_id").cast("string").alias("key"),
            *nulls,
        )
    )
    u2 = (
        p.select("p_brand")
        .subtract(p.filter(F.col("p_size") < 30).select("p_brand"))
        .select(F.lit("except").alias("src"), F.col("p_brand").alias("key"), *nulls)
    )
    piv = (
        ev.groupBy("user_id")
        .agg(
            *[
                F.count(F.when(F.col("event_type") == t, 1)).alias(f"n_{t}")
                for t in _PIVOT_TYPES
            ]
        )
        .select(
            F.lit("pivot").alias("src"),
            F.col("user_id").cast("string").alias("key"),
            *[f"n_{t}" for t in _PIVOT_TYPES],
        )
    )
    return u1.unionByName(u2).unionByName(piv)


@query(
    "pivot_event_type_counts",
    """
    SELECT user_id,
           count(*) FILTER (WHERE event_type = 'click')    AS n_click,
           count(*) FILTER (WHERE event_type = 'view')     AS n_view,
           count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
           count(*) FILTER (WHERE event_type = 'signup')   AS n_signup,
           count(*) FILTER (WHERE event_type = 'error')    AS n_error
    FROM events GROUP BY user_id
    """,
)
def pivot_event_type_counts(spark, sf):
    """Pivot as conditional aggregation — wide per-key layout of the
    per-source counters the reference keeps per table (SURVEY §2.5 A10)."""
    ev = _t(spark, sf, "events")
    return ev.groupBy("user_id").agg(
        *[
            F.count(F.when(F.col("event_type") == t, 1)).alias(f"n_{t}")
            for t in ("click", "view", "purchase", "signup", "error")
        ]
    )


@query(
    "cube_status_priority",
    """
    SELECT o_orderstatus, o_orderpriority, count(*) AS n,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def cube_status_priority(spark, sf):
    """CUBE grouping sets — subtotal lattice over two dimensions (beyond
    the reference's flat GROUP BYs; an OLAP-completeness operator)."""
    o = _t(spark, sf, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total"),
    )


@query(
    "s7_idempotent_insert",
    """
    SELECT count(*) AS n FROM (
      SELECT DISTINCT l_orderkey, l_linenumber FROM (
        SELECT * FROM lineitem UNION ALL SELECT * FROM lineitem) u) t
    """,
)
def s7_idempotent_insert(spark, sf):
    """S7: ON CONFLICT DO NOTHING — inserting a batch twice leaves the PK
    count unchanged (/root/reference/src/actions/collect/nyse_events.rs:145-156)."""
    li = _t(spark, sf, "lineitem")
    return (
        li.unionByName(li)
        .select("l_orderkey", "l_linenumber")
        .dropDuplicates()
        .agg(F.count("*").alias("n"))
    )


@query(
    "s8_merge_upsert",
    """
    SELECT coalesce(u.event_id, t.event_id) AS event_id,
           coalesce(u.value, t.value) AS value
    FROM (SELECT event_id, value FROM events WHERE event_id % 2 = 0) t
    FULL OUTER JOIN
         (SELECT event_id, value * 2 AS value FROM events WHERE event_id % 3 = 0) u
      ON t.event_id = u.event_id
    """,
)
def s8_merge_upsert(spark, sf):
    """S8: MERGE upsert — matched rows updated, new rows inserted
    (/root/reference/src/database/polygon_dividends_service.rs:51-113)."""
    ev = _t(spark, sf, "events")
    target = ev.filter(F.col("event_id") % 2 == 0).select("event_id", "value")
    updates = ev.filter(F.col("event_id") % 3 == 0).select(
        "event_id", (F.col("value") * 2).alias("value")
    )
    # coalesce_missing matches the oracle's coalesce(u.value, t.value)
    return merge_upsert(target, updates, keys=["event_id"], coalesce_missing=True)
