"""Checkpoint compaction (the Iceberg rewrite_data_files analog):
read_all semantics are identical before/after, resume still works, and the
per-table file listing stays bounded over long crawls."""

import os

from pyspark.sql import functions as F

from data_collector_spark.crawler.driver import CrawlConfig, run_crawl
from data_collector_spark.crawler.state import CrawlState
from data_collector_spark.sources.generator import synth_pages


def _mk_corpus(spark, tmp_path, name):
    corpus_dir = str(tmp_path / name)
    synth_pages(spark, 30, n_hosts=3, links_per_page=2, dead_frac=0.1,
                partitions=1).write.parquet(corpus_dir)
    return spark.read.parquet(corpus_dir)


def _inputs(spark, pages):
    seeds = pages.select(F.col("url_canon").alias("url")).limit(8).withColumn(
        "priority", F.lit(0)
    )
    robots = spark.createDataFrame([], "host string, path_prefix string")
    budgets = spark.createDataFrame([("", 3)], "host string, budget_per_round int")
    return seeds, robots, budgets


def _snapshot(spark, wd):
    st = CrawlState(wd)
    seen = sorted(r["url_sha1"] for r in st.read_all(spark, "seen").collect())
    log = sorted(
        (r["round"], r["host"], r["seq_in_host"], r["url_sha1"], r["status"])
        for r in st.read_all(spark, "fetch_log").collect()
    )
    return seen, log


def test_long_crawl_compaction_twin_and_bounded_files(spark, tmp_path):
    """21-round crawl with recrawl churn: the compacting twin produces the
    identical seen set + fetch log as the non-compacting one, keeps a
    bounded round-dir count, and resumes correctly afterwards."""
    pages = _mk_corpus(spark, tmp_path, "corpus")
    seeds, robots, budgets = _inputs(spark, pages)
    kw = dict(max_rounds=21, default_budget=3, retry_max=1,
              recrawl_ttl_rounds=4)
    run_crawl(spark, str(tmp_path / "a"), pages, seeds, robots, budgets,
              CrawlConfig(compact_every_rounds=5, **kw))
    run_crawl(spark, str(tmp_path / "b"), pages, seeds, robots, budgets,
              CrawlConfig(**kw))
    assert _snapshot(spark, str(tmp_path / "a")) == _snapshot(spark, str(tmp_path / "b"))

    # bounded listing: at most compact_every_rounds+1 live round dirs + one base
    for table in ("seen", "fetch_log"):
        base = str(tmp_path / "a" / table)
        rounds = [e for e in os.listdir(base) if e.startswith("round=")]
        bases = [e for e in os.listdir(base) if e.startswith("base@")]
        assert len(rounds) <= 6, f"{table}: {sorted(rounds)}"
        assert len(bases) == 1, f"{table}: {bases}"
    # seen set still unique after compaction
    st = CrawlState(str(tmp_path / "a"))
    seen = st.read_all(spark, "seen")
    assert seen.count() == seen.select("url_sha1").distinct().count()

    # resume BOTH twins two more rounds: still identical
    kw2 = dict(kw, max_rounds=23)
    ms_a = run_crawl(spark, str(tmp_path / "a"), pages, seeds, robots, budgets,
                     CrawlConfig(compact_every_rounds=5, **kw2))
    ms_b = run_crawl(spark, str(tmp_path / "b"), pages, seeds, robots, budgets,
                     CrawlConfig(**kw2))
    assert [m.round for m in ms_a] == [m.round for m in ms_b] == [21, 22]
    assert _snapshot(spark, str(tmp_path / "a")) == _snapshot(spark, str(tmp_path / "b"))


def test_compaction_crash_windows_leave_table_readable(spark, tmp_path):
    """The two crash windows around the manifest commit:
    (a) base@K written but manifest NOT updated -> the new base is ignored,
        reads come from the round dirs exactly as before;
    (b) manifest updated but superseded round dirs NOT yet deleted -> the
        stale dirs are filtered out by the manifest, no double-counting."""
    pages = _mk_corpus(spark, tmp_path, "cc")
    seeds, robots, budgets = _inputs(spark, pages)
    wd = str(tmp_path / "wdc")
    run_crawl(spark, wd, pages, seeds, robots, budgets,
              CrawlConfig(max_rounds=4, default_budget=3))
    st = CrawlState(wd)
    before = sorted(
        (r["round"], r["url_sha1"], r["status"])
        for r in st.read_all(spark, "fetch_log").collect()
    )

    # (a) write the base dir exactly as compact() would, but "crash" before
    # the manifest commit
    from pyspark.sql import functions as F2

    df = st.read_all(spark, "fetch_log").filter(F2.col("round") <= 3)
    df.repartition(4).write.mode("overwrite").parquet(
        os.path.join(wd, "fetch_log", "base@3")
    )
    assert st.compacted_upto("fetch_log") is None
    mid = sorted(
        (r["round"], r["url_sha1"], r["status"])
        for r in st.read_all(spark, "fetch_log").collect()
    )
    assert mid == before

    # (b) commit the manifest level but leave the superseded dirs in place
    stt = st.read()
    stt.setdefault("compacted", {})["fetch_log"] = 3
    st._write_manifest(stt)
    after = sorted(
        (r["round"], r["url_sha1"], r["status"])
        for r in st.read_all(spark, "fetch_log").collect()
    )
    assert after == before  # base used, stale round dirs ignored — no dupes


def test_compact_is_idempotent_and_read_round_survives(spark, tmp_path):
    pages = _mk_corpus(spark, tmp_path, "c2")
    seeds, robots, budgets = _inputs(spark, pages)
    wd = str(tmp_path / "wd2")
    run_crawl(spark, wd, pages, seeds, robots, budgets,
              CrawlConfig(max_rounds=4, default_budget=3))
    st = CrawlState(wd)
    before = sorted(
        (r["url_sha1"], r["status"]) for r in st.read_round(spark, "fetch_log", 1).collect()
    )
    st.compact(spark, "fetch_log", 3)
    assert st.compacted_upto("fetch_log") == 3
    st.compact(spark, "fetch_log", 3)  # no-op, not an error
    st.compact(spark, "fetch_log", 2)  # lower level: no-op
    assert st.compacted_upto("fetch_log") == 3
    after = sorted(
        (r["url_sha1"], r["status"]) for r in st.read_round(spark, "fetch_log", 1).collect()
    )
    assert before == after
    assert st.has_round("fetch_log", 0) and st.has_round("fetch_log", 3)
