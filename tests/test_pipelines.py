"""Task-graph scheduler (D1-D5): validation panics and Kahn execution with
concurrent independent branches — mirroring the reference's
schedule.rs:118-138 (validation) and :236-296 (parallel execution)."""

import time

import pytest
from pyspark.sql import functions as F

from data_collector_spark.crawler.pipelines import (
    GraphValidationError,
    Task,
    TaskGraph,
)


def test_duplicate_names_rejected(spark):
    g = TaskGraph([Task("a", lambda s: 1), Task("a", lambda s: 2)])
    with pytest.raises(GraphValidationError, match="duplicate"):
        g.validate()


def test_unknown_dependency_rejected(spark):
    g = TaskGraph([Task("a", lambda s: 1, deps=("ghost",))])
    with pytest.raises(GraphValidationError, match="unknown"):
        g.validate()


def test_cycle_rejected(spark):
    g = TaskGraph(
        [Task("a", lambda s: 1, deps=("b",)), Task("b", lambda s: 2, deps=("a",))]
    )
    with pytest.raises(GraphValidationError, match="cycle"):
        g.validate()


def test_execution_respects_dependencies(spark):
    order = []
    g = TaskGraph()
    g.add("load", lambda s: order.append("load") or 10)
    g.add("stage", lambda s: order.append("stage") or 20, deps=("load",))
    g.add("report", lambda s: order.append("report") or 30, deps=("stage", "load"))
    res = g.run(spark, max_workers=4)
    assert order.index("load") < order.index("stage") < order.index("report")
    assert res["report"].value == 30 and all(r.ok for r in res.values())


def test_independent_branches_overlap(spark):
    """Two dependency-free tasks must run concurrently (the reference
    spawns them as parallel tokio tasks, schedule.rs:236-296)."""
    spans = {}

    def timed(name, dur):
        def fn(s):
            t0 = time.monotonic()
            time.sleep(dur)
            spans[name] = (t0, time.monotonic())
            return name

        return fn

    g = TaskGraph([Task("x", timed("x", 1.0)), Task("y", timed("y", 1.0))])
    t0 = time.monotonic()
    g.run(spark, max_workers=2)
    wall = time.monotonic() - t0
    assert wall < 1.8, f"branches serialized: wall={wall:.2f}s"
    (xa, xb), (ya, yb) = spans["x"], spans["y"]
    assert max(xa, ya) < min(xb, yb), "no temporal overlap"


def test_failure_skips_dependents_but_not_independents(spark):
    done = []

    def boom(s):
        raise ValueError("kaput")

    g = TaskGraph()
    g.add("bad", boom)
    g.add("child", lambda s: done.append("child"), deps=("bad",))
    g.add("other", lambda s: done.append("other"))
    with pytest.raises(RuntimeError, match="bad: ValueError"):
        g.run(spark, max_workers=2)
    assert "other" in done and "child" not in done


def test_run_downstream_on_error_matches_reference(spark):
    """D5 reference semantics (/root/reference/src/dag_schedule/
    task.rs:209-221): a failed task still sends its outgoing edges, so
    dependents run on partial data; the failure is still raised at the
    end. Transitive chains release too."""
    done = []

    def boom(s):
        raise ValueError("kaput")

    g = TaskGraph()
    g.add("bad", boom)
    g.add("child", lambda s: done.append("child"), deps=("bad",))
    g.add("grandchild", lambda s: done.append("grandchild"), deps=("child",))
    with pytest.raises(RuntimeError, match="bad: ValueError"):
        g.run(spark, max_workers=2, run_downstream_on_error=True)
    assert done == ["child", "grandchild"]


def test_two_concurrent_crawls_match_sequential(spark, tmp_path):
    """Two independent crawl pipelines on one SparkSession produce the
    same outputs as running them one after the other."""
    from data_collector_spark.crawler.driver import CrawlConfig, run_crawl
    from data_collector_spark.crawler.state import CrawlState
    from data_collector_spark.sources.generator import (
        synth_pages,
        synth_politeness,
        synth_robots,
        synth_seeds,
    )

    corpus_dir = str(tmp_path / "corpus")
    synth_pages(spark, 120, n_hosts=4, partitions=2).write.parquet(corpus_dir)
    pages = spark.read.parquet(corpus_dir)

    def crawl_fn(wd, budget):
        def fn(s):
            return run_crawl(
                s, wd, pages, synth_seeds(s, 120, n_hosts=4), synth_robots(s),
                synth_politeness(s, budget), CrawlConfig(max_rounds=2),
            )

        return fn

    g = TaskGraph(
        [
            Task("crawl_a", crawl_fn(str(tmp_path / "wa"), 3)),
            Task("crawl_b", crawl_fn(str(tmp_path / "wb"), 5)),
        ]
    )
    g.run(spark, max_workers=2)
    # sequential twins
    crawl_fn(str(tmp_path / "sa"), 3)(spark)
    crawl_fn(str(tmp_path / "sb"), 5)(spark)

    def seen(wd):
        return sorted(
            r["url_sha1"]
            for r in CrawlState(wd).read_all(spark, "seen").collect()
        )

    assert seen(str(tmp_path / "wa")) == seen(str(tmp_path / "sa"))
    assert seen(str(tmp_path / "wb")) == seen(str(tmp_path / "sb"))
