"""Physical-plan assertions: the optimizations SURVEY.md §4 claims are
actually present — filter pushdown, column pruning, broadcast joins,
whole-stage codegen. These fail if a refactor silently degrades a plan."""

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from data_collector_spark.plans import QUERIES


def plan_of(df, mode="formatted") -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def test_q1_pushdown_and_pruning(spark, sf_dir):
    p = plan_of(QUERIES["q1_pricing_summary"](spark, sf_dir))
    assert "PushedFilters" in p and "l_shipdate" in p.split("PushedFilters", 1)[1]
    # column pruning: unused columns are not in ReadSchema
    read_schema = p.split("ReadSchema", 1)[1].split("\n", 1)[0]
    assert "l_partkey" not in read_schema and "l_suppkey" not in read_schema
    # whole pipeline is JVM expressions (AQE hides codegen spans pre-exec)
    assert "PythonUDF" not in p and "ArrowEvalPython" not in p


def test_j2_broadcasts_dimensions(spark, sf_dir):
    p = plan_of(QUERIES["j2_broadcast_dims"](spark, sf_dir))
    assert p.count("BroadcastHashJoin") >= 2  # nation and region sides


def test_j5_anti_join_strategy(spark, sf_dir):
    p = plan_of(QUERIES["j5_anti_dedup_insert"](spark, sf_dir))
    assert "LeftAnti" in p


def test_j8_filter_reaches_scan(spark, sf_dir):
    p = plan_of(QUERIES["j8_partition_pruned_join"](spark, sf_dir))
    # the derived year_month predicate must be applied before the join
    before_join = p.split("Join", 1)[0] if "Join" in p else p
    assert "Filter" in p
    assert "PushedFilters" in p


def test_wave_pop_no_python_udf(spark):
    """The politeness pop is windows + joins only — no Python worker."""
    import hashlib
    from datetime import datetime

    from data_collector_spark.operators.politeness import pop_wave

    rows = [
        (
            f"http://h{i%3}.test/p/{i}",
            hashlib.sha1(f"u{i}".encode()).hexdigest(),
            f"h{i%3}.test",
            0,
            datetime(2024, 1, 1),
            0,
        )
        for i in range(50)
    ]
    f = spark.createDataFrame(
        rows,
        "url_canon string, url_sha1 string, host string, depth int, "
        "discovery_ts timestamp, priority int",
    )
    budgets = spark.createDataFrame([("", 2)], "host string, budget_per_round int")
    wave, _ = pop_wave(f, budgets)
    p = plan_of(wave)
    assert "Window" in p
    assert "PythonUDF" not in p and "ArrowEvalPython" not in p


def test_minhash_stays_jvm_side(spark, sf_dir):
    p = plan_of(QUERIES["dedup_minhash_lsh"](spark, sf_dir))
    assert "PythonUDF" not in p and "ArrowEvalPython" not in p
    assert "md5" in p.lower() or "WholeStageCodegen" in p


def test_decontaminate_broadcasts_bench_grams_jvm_side(spark, sf_dir):
    """The contamination probe broadcasts the benchmark's distinct gram
    set (never shuffles the training side against it) and the gram
    construction is pure JVM expressions."""
    p = plan_of(QUERIES["decontaminate"](spark, sf_dir))
    assert "PythonUDF" not in p and "ArrowEvalPython" not in p
    assert "BroadcastHashJoin" in p
    # the composed pipeline keeps the anti-join + broadcast shape
    p2 = plan_of(QUERIES["training_filter_pipeline"](spark, sf_dir))
    assert "PythonUDF" not in p2 and "ArrowEvalPython" not in p2
    assert "LeftAnti" in p2


def test_ann_paths_stay_jvm_side(spark, sf_dir):
    """LSH bucketing and IVF cell assignment are codegen expressions now —
    no Python workers anywhere in the ANN plans."""
    for name in ("ann_lsh_topk", "ann_ivf_topk"):
        p = plan_of(QUERIES[name](spark, sf_dir))
        assert "PythonUDF" not in p and "ArrowEvalPython" not in p, name


def test_deferred_derived_without_join(spark):
    """The politeness deferred set is the window-trimmed rows — recovering
    it must NOT join (the old broadcast anti-join OOMs on 10^7-URL waves)."""
    import hashlib
    from datetime import datetime

    from data_collector_spark.operators.politeness import pop_wave

    rows = [
        (
            f"http://h{i%3}.test/p/{i}",
            hashlib.sha1(f"u{i}".encode()).hexdigest(),
            f"h{i%3}.test",
            0,
            datetime(2024, 1, 1),
            0,
        )
        for i in range(50)
    ]
    f = spark.createDataFrame(
        rows,
        "url_canon string, url_sha1 string, host string, depth int, "
        "discovery_ts timestamp, priority int",
    )
    budgets = spark.createDataFrame([("", 2)], "host string, budget_per_round int")
    _, deferred = pop_wave(f, budgets)
    p = plan_of(deferred)
    assert "Join" not in p
    assert "PythonUDF" not in p and "ArrowEvalPython" not in p


def test_fetch_join_broadcasts_wave(spark, sf_dir):
    """pages ⋈ wave must broadcast the (budget-bounded) wave side."""
    pages = spark.createDataFrame(
        [("http://a.test/1", b"<p>x</p>")], "url_canon string, html binary"
    )
    wave = spark.createDataFrame([("http://a.test/1",)], "url_canon string")
    j = pages.join(F.broadcast(wave), "url_canon", "inner")
    assert "BroadcastHashJoin" in plan_of(j)


def test_fetch_join_bucketed_pages_no_exchange(spark, tmp_path):
    """Above the broadcast gate the fetch join must be storage-partitioned-
    join-ready: against a pages table bucketed by url_canon, the join
    plans with NO Exchange on the pages side — only the (bounded) wave
    side shuffles into the bucket layout. This pins crawler/round.py's
    cluster-scale claim (the 100 TB corpus is never reshuffled) as a plan
    property rather than a comment."""
    from data_collector_spark.sources.generator import synth_pages

    spark.sql("DROP TABLE IF EXISTS pages_bucketed_plan")
    synth_pages(spark, 300, n_hosts=4, partitions=4).write.bucketBy(
        8, "url_canon"
    ).sortBy("url_canon").option(
        "path", str(tmp_path / "pages_bucketed_plan")
    ).saveAsTable("pages_bucketed_plan")
    try:
        pages = spark.table("pages_bucketed_plan").select(
            "url_canon", "warc_ts", "html"
        )
        wave = spark.createDataFrame(
            [(f"http://h{i % 4}.test/p/{i}", "x" * 40, f"h{i % 4}.test", 0, i)
             for i in range(40)],
            "url_canon string, url_sha1 string, host string, depth int, "
            "seq_in_host int",
        )
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            # the above-gate shape from round.py: NO broadcast hint
            hits = pages.join(wave, "url_canon", "inner")
            p = plan_of(hits)
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        assert "Bucketed: true" in p, p
        assert "BroadcastHashJoin" not in p
        # exactly one shuffle — the wave side entering the bucket layout;
        # a second Exchange would mean the pages scan is being reshuffled
        # ("Exchange (n" matches the tree node, not its detail block)
        assert p.count("Exchange (") == 1, p
    finally:
        spark.sql("DROP TABLE IF EXISTS pages_bucketed_plan")


def test_seen_anti_join_bucketed_no_exchange(spark, tmp_path):
    """The per-round seen anti-join must be storage-partitioned-join-ready
    on the SEEN side: against a seen table bucketed by url_sha1 (the
    Iceberg `bucket(N, url_sha1)` layout operators/seen.py documents),
    the exact left-anti backstop plans with NO Exchange on the seen scan
    — only the (bounded) candidate side shuffles into the bucket layout.
    At 10^10 seen keys this is the difference between reshuffling the
    entire seen table every round and reshuffling one round's candidates."""
    from data_collector_spark.operators.seen import dedup_against_seen

    spark.sql("DROP TABLE IF EXISTS seen_bucketed_plan")
    spark.createDataFrame(
        [(f"{i:040x}", f"http://h{i % 4}.test/p/{i}") for i in range(400)],
        "url_sha1 string, url_canon string",
    ).write.bucketBy(8, "url_sha1").sortBy("url_sha1").option(
        "path", str(tmp_path / "seen_bucketed_plan")
    ).saveAsTable("seen_bucketed_plan")
    try:
        seen = spark.table("seen_bucketed_plan")
        cand = spark.createDataFrame(
            [(f"{i:040x}", f"http://h{i % 4}.test/p/{i}", 1, i, f"h{i % 4}.test",
              1, 0, 1)
             for i in range(300, 340)],
            "url_sha1 string, url_canon string, depth int, discovery_ts long, "
            "host string, priority int, attempt int, not_before_round int",
        )
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            # the no-filter shape of dedup_against_seen (gate-deferred, or
            # every candidate a bloom suspect): the exact anti-join backstop
            out = dedup_against_seen(spark, cand, seen, None)
            p = plan_of(out)
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        assert "Bucketed: true" in p, p
        assert "LeftAnti" in p
        # exactly one shuffle — the candidate side entering the bucket
        # layout; a second Exchange would mean the seen scan is reshuffled
        assert p.count("Exchange (") == 1, p
    finally:
        spark.sql("DROP TABLE IF EXISTS seen_bucketed_plan")


def test_fetch_scan_prunes_corpus_columns(spark, tmp_path):
    """The 100 TB corpus scan must read ONLY (url_canon, warc_ts, html) —
    a scan dragging text/lang through a wave join is wrong at any scale.
    The join key filter must also reach the parquet reader."""
    from data_collector_spark.sources.generator import synth_pages

    d = str(tmp_path / "prune_corpus")
    synth_pages(spark, 200, n_hosts=4, partitions=2).write.parquet(d)
    pages = spark.read.parquet(d)
    wave = spark.createDataFrame(
        [("http://h1.test/p/1", "a" * 40, "h1.test", 0, 1)],
        "url_canon string, url_sha1 string, host string, depth int, seq_in_host int",
    )
    hits = pages.select("url_canon", "warc_ts", "html").join(
        F.broadcast(wave), "url_canon", "inner"
    )
    p = plan_of(hits)
    read_schema = p.split("ReadSchema", 1)[1].split("\n", 1)[0]
    assert "html" in read_schema and "warc_ts" in read_schema
    assert "text" not in read_schema and "lang" not in read_schema
    assert "PushedFilters" in p and "IsNotNull(url_canon)" in p


def test_composed_suites_stay_jvm_side_and_prune(spark, sf_dir):
    """The r3 composed driver suites are single-scan, codegen-only plans
    with exact column pruning — one ReadSchema carrying only the used
    columns, no Python nodes anywhere."""
    expected_read = {
        "f_dates_suite": ["o_orderkey", "o_orderstatus", "o_orderdate",
                          "o_orderpriority"],
        "f_events_suite": ["event_id", "user_id", "value", "props"],
        "f_strings_suite": ["c_custkey", "c_name", "c_mktsegment"],
        "text_stats_suite": ["doc_id", "text"],
    }
    for name, cols in expected_read.items():
        p = plan_of(QUERIES[name](spark, sf_dir))
        assert "PythonUDF" not in p and "ArrowEvalPython" not in p, name
        read_schema = p.split("ReadSchema", 1)[1].split("\n", 1)[0]
        for c in cols:
            assert c in read_schema, f"{name}: {c} missing from scan"
        # nothing beyond the expected columns is read (flat schemas: one
        # comma between fields inside the struct<...>)
        n_fields = read_schema.split("<", 1)[1].count(",") + 1
        assert n_fields == len(cols), f"{name}: scan reads {read_schema}"


def test_robots_txt_parser_is_codegen(spark):
    from data_collector_spark.operators.robots import parse_robots_txt

    df = spark.createDataFrame(
        [("h.test", "User-agent: *\nDisallow: /x")],
        "host string, robots_txt string",
    )
    p = plan_of(parse_robots_txt(df))
    assert "PythonUDF" not in p and "ArrowEvalPython" not in p


def test_sitemap_parser_is_codegen(spark):
    from data_collector_spark.sources.sitemap import seeds_from_sitemaps

    df = spark.createDataFrame(
        [("<url><loc>http://h.test/a</loc></url>",)], "sitemap_xml string"
    )
    p = plan_of(seeds_from_sitemaps(df))
    assert "PythonUDF" not in p and "ArrowEvalPython" not in p
