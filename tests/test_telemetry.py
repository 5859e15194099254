"""Structured span telemetry (utils/telemetry.rs analog): crawl rounds and
TaskGraph tasks emit start/end spans + counters to workdir/events.jsonl."""

from pyspark.sql import functions as F

from data_collector_spark.crawler.driver import CrawlConfig, run_crawl
from data_collector_spark.crawler.pipelines import Task, TaskGraph
from data_collector_spark.crawler.telemetry import EventLog
from data_collector_spark.sources.generator import (
    synth_pages,
    synth_politeness,
    synth_robots,
    synth_seeds,
)


def test_crawl_emits_round_spans(spark, tmp_path):
    corpus_dir = str(tmp_path / "tele_corpus")
    synth_pages(spark, 60, n_hosts=3, partitions=2).write.parquet(corpus_dir)
    pages = spark.read.parquet(corpus_dir)
    wd = str(tmp_path / "tele_wd")
    metrics = run_crawl(
        spark, wd, pages, synth_seeds(spark, 60, n_hosts=3), synth_robots(spark),
        synth_politeness(spark, 5), CrawlConfig(max_rounds=2),
    )
    ev = EventLog(f"{wd}/events.jsonl").read()
    kinds = [e["kind"] for e in ev]
    assert kinds[0] == "crawl_start" and kinds[-1] == "crawl_end"
    assert kinds.count("round_start") == kinds.count("round_end") == len(metrics)
    # counters in the trace match the committed metrics
    mrows = [e for e in ev if e["kind"] == "round_metrics"]
    assert [r["fetched"] for r in mrows] == [m.fetched for m in metrics]
    assert all(e["duration_sec"] >= 0 for e in ev if e["kind"] == "round_end")
    # resume appends a crawl_resume span to the same log
    run_crawl(
        spark, wd, pages, synth_seeds(spark, 60, n_hosts=3), synth_robots(spark),
        synth_politeness(spark, 5), CrawlConfig(max_rounds=3),
    )
    ev2 = EventLog(f"{wd}/events.jsonl").read()
    assert any(e["kind"] == "crawl_resume" and e["start_round"] == 2 for e in ev2)


def test_taskgraph_emits_task_spans(spark, tmp_path):
    log = EventLog(str(tmp_path / "graph_events.jsonl"))
    g = TaskGraph([
        Task("a", lambda s: 1),
        Task("b", lambda s: 2, deps=("a",)),
    ])
    g.run(spark, max_workers=2, events=log)
    ev = log.read()
    starts = [e["name"] for e in ev if e["kind"] == "task_start"]
    ends = [e["name"] for e in ev if e["kind"] == "task_end"]
    assert sorted(starts) == sorted(ends) == ["a", "b"]
    assert [e for e in ev if e["kind"] == "task_failed"] == []
