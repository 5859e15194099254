"""Purge (takedown / forget-and-recrawl): seen + pages_out + filter all
forget the keys, the standard discovery path re-admits them, and the
rewrite is idempotent — including on compacted checkpoints (generation-
suffix base swap)."""

import os

import pytest
from pyspark.sql import functions as F

from data_collector_spark.crawler.driver import CrawlConfig, run_crawl
from data_collector_spark.crawler.purge import purge_urls
from data_collector_spark.crawler.state import CrawlState
from data_collector_spark.operators.seen import dedup_against_seen
from data_collector_spark.sources.generator import synth_pages


def _crawl(spark, tmp_path, name, **cfg_kw):
    corpus_dir = str(tmp_path / f"{name}_corpus")
    synth_pages(spark, 16, n_hosts=2, links_per_page=2, dead_frac=0.0,
                partitions=1).write.parquet(corpus_dir)
    pages = spark.read.parquet(corpus_dir)
    seeds = pages.select(F.col("url_canon").alias("url")).withColumn(
        "priority", F.lit(0)
    )
    robots = spark.createDataFrame([], "host string, path_prefix string")
    budgets = spark.createDataFrame([("", 20)], "host string, budget_per_round int")
    wd = str(tmp_path / f"{name}_wd")
    cfg = CrawlConfig(max_rounds=2, default_budget=20, bloom_min_seen_rows=0, **cfg_kw)
    run_crawl(spark, wd, pages, seeds, robots, budgets, cfg)
    return wd, cfg


@pytest.mark.parametrize("seen_filter", ["cuckoo", "bloom"])
def test_purge_forgets_and_readmits(spark, tmp_path, seen_filter):
    wd, cfg = _crawl(spark, tmp_path, f"p_{seen_filter}", seen_filter=seen_filter)
    state = CrawlState(wd)
    seen0 = state.read_all(spark, "seen").select("url_sha1", "url_canon").collect()
    assert len(seen0) == 16
    gone = sorted(r["url_sha1"] for r in seen0)[:4]
    gone_df = spark.createDataFrame([(k,) for k in gone], "url_sha1 string")

    removed = purge_urls(spark, wd, gone_df, cfg=cfg)
    assert removed["seen"] == 4 and removed["pages_out"] == 4
    if seen_filter == "cuckoo":
        assert removed["filter_fingerprints"] == 4

    # state tables forgot the keys
    seen = state.read_all(spark, "seen")
    assert seen.count() == 12
    # the manifest's running seen count (r5 activation-gate input) tracks
    # the rewrite, so a future gated resume reads the post-purge size
    assert (state.read() or {}).get("seen_rows") == 12
    assert seen.filter(F.col("url_sha1").isin(gone)).count() == 0
    assert (
        state.read_all(spark, "pages_out")
        .filter(F.col("url_sha1").isin(gone)).count() == 0
    )
    # fetch_log lineage kept by default
    assert (
        state.read_all(spark, "fetch_log")
        .filter(F.col("url_sha1").isin(gone)).count() > 0
    )

    # the standard discovery path re-admits purged keys and only them
    flt = cfg.load_bloom(state.bloom_dir())
    cand = spark.createDataFrame(
        [(r["url_sha1"], r["url_canon"]) for r in seen0],
        "url_sha1 string, url_canon string",
    )
    survivors = sorted(
        r["url_sha1"]
        for r in dedup_against_seen(
            spark, cand, seen.select("url_sha1"), flt
        ).collect()
    )
    assert survivors == gone

    # idempotent: purging again removes nothing
    removed2 = purge_urls(spark, wd, gone_df, cfg=cfg)
    assert removed2["seen"] == 0 and removed2["pages_out"] == 0


def test_purge_rerun_reconciles_seen_count_after_crash_window(spark, tmp_path):
    """Crash window (code-review r5): dying between the seen rewrite and
    the manifest commit leaves seen_rows overstated, and the re-run removes
    0 rows — so the count must be RECONCILED against the rewritten table,
    not decremented by the re-run's (zero) delta."""
    wd, cfg = _crawl(spark, tmp_path, "crash", seen_filter="cuckoo")
    state = CrawlState(wd)
    gone = sorted(
        r["url_sha1"] for r in state.read_all(spark, "seen").collect()
    )[:4]
    gone_df = spark.createDataFrame([(k,) for k in gone], "url_sha1 string")
    purge_urls(spark, wd, gone_df, cfg=cfg)

    # simulate the crash: restore the pre-purge (overstated) running count
    st = state.read()
    st["seen_rows"] = 16
    state._write_manifest(st)

    # the documented recovery is re-running the purge; it removes nothing
    # but must still bring the count back in step with the table
    removed = purge_urls(spark, wd, gone_df, cfg=cfg)
    assert removed["seen"] == 0
    assert (state.read() or {}).get("seen_rows") == 12


def test_purge_external_list_only_deletes_confirmed_seen(spark, tmp_path):
    """A takedown list can contain never-crawled URLs. Deleting a
    never-inserted key from a cuckoo filter can strip an indistinguishable
    twin's fingerprint (a silent false negative for a genuinely-seen URL),
    so purge must pass delete_df ONLY the keys the exact pre-purge seen
    table confirms — and every still-seen key must keep probing True."""
    import hashlib

    wd, cfg = _crawl(spark, tmp_path, "ext", seen_filter="cuckoo")
    state = CrawlState(wd)
    seen0 = state.read_all(spark, "seen").select("url_sha1", "url_canon").collect()
    seen_keys = sorted(r["url_sha1"] for r in seen0)
    confirmed = seen_keys[:2]
    never = [hashlib.sha1(f"never-crawled-{i}".encode()).hexdigest() for i in range(3)]
    takedown = spark.createDataFrame(
        [(k,) for k in confirmed + never], "url_sha1 string"
    )

    removed = purge_urls(spark, wd, takedown, cfg=cfg)
    assert removed["seen"] == 2 and removed["pages_out"] == 2
    # only the 2 confirmed keys reached the filter delete
    assert removed["filter_fingerprints"] == 2

    # no false negatives for surviving seen keys
    flt = cfg.load_bloom(state.bloom_dir())
    survivors = spark.createDataFrame(
        [(r["url_sha1"], r["url_canon"]) for r in seen0
         if r["url_sha1"] not in confirmed],
        "url_sha1 string, url_canon string",
    )
    assert (
        flt.with_maybe_seen(spark, survivors)
        .filter(~F.col("maybe_seen")).count() == 0
    )


def test_purge_full_erasure_includes_log(spark, tmp_path):
    wd, cfg = _crawl(spark, tmp_path, "erase", seen_filter="cuckoo")
    state = CrawlState(wd)
    gone = sorted(
        r["url_sha1"] for r in state.read_all(spark, "seen").collect()
    )[:3]
    gone_df = spark.createDataFrame([(k,) for k in gone], "url_sha1 string")
    removed = purge_urls(spark, wd, gone_df, cfg=cfg, purge_log=True)
    assert removed["fetch_log"] >= 3  # fetched rows (+ possible dead rows)
    assert (
        state.read_all(spark, "fetch_log")
        .filter(F.col("url_sha1").isin(gone)).count() == 0
    )


def test_purge_on_compacted_checkpoint_generation_swap(spark, tmp_path):
    """Purging a fully-compacted table rewrites into a NEW generation dir
    (base@K#2) — never the dir being read — and reads stay consistent."""
    wd, cfg = _crawl(spark, tmp_path, "gen", seen_filter="cuckoo",
                     compact_every_rounds=1)
    state = CrawlState(wd)
    assert state.compacted_upto("seen") is not None
    before = state.read_all(spark, "seen").count()
    gone = sorted(r["url_sha1"] for r in state.read_all(spark, "seen").collect())[:2]
    gone_df = spark.createDataFrame([(k,) for k in gone], "url_sha1 string")
    purge_urls(spark, wd, gone_df, cfg=cfg)
    assert state.read_all(spark, "seen").count() == before - 2
    # exactly one base generation remains on disk
    entries = [e for e in os.listdir(os.path.join(wd, "seen")) if e.startswith("base@")]
    assert len(entries) == 1
    # a second purge bumps the generation again without corruption
    more = sorted(r["url_sha1"] for r in state.read_all(spark, "seen").collect())[:2]
    purge_urls(
        spark, wd,
        spark.createDataFrame([(k,) for k in more], "url_sha1 string"), cfg=cfg,
    )
    assert state.read_all(spark, "seen").count() == before - 4
    # and the crawl still resumes cleanly on the purged checkpoint (the
    # closed corpus drained in round 0, so the resume is a no-op pass
    # over the compacted+purged state — it must not error or lose state)
    pages = spark.read.parquet(str(tmp_path / "gen_corpus"))
    seeds = pages.select(F.col("url_canon").alias("url")).withColumn(
        "priority", F.lit(0)
    )
    robots = spark.createDataFrame([], "host string, path_prefix string")
    budgets = spark.createDataFrame([("", 20)], "host string, budget_per_round int")
    run_crawl(spark, wd, pages, seeds, robots, budgets,
              CrawlConfig(max_rounds=3, default_budget=20, seen_filter="cuckoo",
                          bloom_min_seen_rows=0,
                          compact_every_rounds=1))
    assert state.last_committed_round() == 0  # drained; nothing re-run
    assert state.read_all(spark, "seen").count() == before - 4
