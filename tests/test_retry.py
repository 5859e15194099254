"""D6 retry-with-backoff: dead URLs re-enqueued with exponential round
backoff, bounded by retry_max (reference: 0..=max_retries with
Constant/Linear/Exponential backoff, /root/reference/src/dag_schedule/
task.rs:277-329; default 0 retries, task.rs:250-259)."""

from pyspark.sql import functions as F

from data_collector_spark.crawler.driver import CrawlConfig, run_crawl
from data_collector_spark.crawler.state import CrawlState
from data_collector_spark.sources.generator import synth_pages, url_of


def test_dead_url_retried_with_backoff(spark, tmp_path):
    corpus_dir = str(tmp_path / "corpus")
    synth_pages(spark, 50, n_hosts=3, partitions=2).write.parquet(corpus_dir)
    pages = spark.read.parquet(corpus_dir)
    dead_url = "http://h1.test/p/99999"  # not in the corpus
    live_url = url_of(0, 3, 2.0, 42)     # page 0's real (hash-assigned) host
    seeds = spark.createDataFrame(
        [(dead_url, 0), (live_url, 0)], "url string, priority int"
    )
    robots = spark.createDataFrame([], "host string, path_prefix string")
    budgets = spark.createDataFrame([("", 5)], "host string, budget_per_round int")

    wd = str(tmp_path / "wd")
    metrics = run_crawl(
        spark, wd, pages, seeds, robots, budgets,
        CrawlConfig(max_rounds=5, retry_max=2, retry_backoff_base=2),
    )
    state = CrawlState(wd)
    dead_rows = (
        state.read_all(spark, "fetch_log")
        .filter((F.col("status") == "dead") & (F.col("url_canon") == dead_url))
        .select("round")
        .collect()
    )
    rounds = sorted(r["round"] for r in dead_rows)
    # attempt 0 @ round 0; retry 1 eligible round 0+2^0=1; retry 2 eligible 1+2^1=3
    assert rounds == [0, 1, 3]
    # at least this URL's two retries (organic dead links may add more)
    assert sum(m.retried for m in metrics) >= 2


def _dead_retry_rounds(spark, tmp_path, name, cfg):
    """Crawl with one dead seed; -> sorted rounds its 'dead' rows land in."""
    corpus_dir = str(tmp_path / f"{name}_corpus")
    synth_pages(spark, 50, n_hosts=3, partitions=2).write.parquet(corpus_dir)
    pages = spark.read.parquet(corpus_dir)
    dead_url = "http://h1.test/p/77777"
    seeds = spark.createDataFrame([(dead_url, 0)], "url string, priority int")
    robots = spark.createDataFrame([], "host string, path_prefix string")
    budgets = spark.createDataFrame([("", 5)], "host string, budget_per_round int")
    run_crawl(spark, str(tmp_path / f"{name}_wd"), pages, seeds, robots, budgets, cfg)
    state = CrawlState(str(tmp_path / f"{name}_wd"))
    rows = (
        state.read_all(spark, "fetch_log")
        .filter((F.col("status") == "dead") & (F.col("url_canon") == dead_url))
        .select("round")
        .collect()
    )
    return sorted(r["round"] for r in rows)


def test_constant_backoff_family(spark, tmp_path):
    # reference Constant (task.rs:263-276): every retry waits the same
    # step; attempt 1 eligible at 0+2=2, attempt 2 at 2+2=4
    rounds = _dead_retry_rounds(
        spark, tmp_path, "const",
        CrawlConfig(max_rounds=6, retry_max=2,
                    retry_backoff="constant", retry_backoff_step=2),
    )
    assert rounds == [0, 2, 4]


def test_linear_backoff_family(spark, tmp_path):
    # reference Linear (task.rs:277-299): wait grows with the attempt
    # number; attempt 1 at 0+2*1=2, attempt 2 at 2+2*2=6
    rounds = _dead_retry_rounds(
        spark, tmp_path, "lin",
        CrawlConfig(max_rounds=7, retry_max=2,
                    retry_backoff="linear", retry_backoff_step=2),
    )
    assert rounds == [0, 2, 6]


def test_no_retries_by_default(spark, tmp_path):
    corpus_dir = str(tmp_path / "c2")
    synth_pages(spark, 50, n_hosts=3, partitions=2).write.parquet(corpus_dir)
    pages = spark.read.parquet(corpus_dir)
    dead_url = "http://h1.test/p/88888"
    seeds = spark.createDataFrame([(dead_url, 0)], "url string, priority int")
    robots = spark.createDataFrame([], "host string, path_prefix string")
    budgets = spark.createDataFrame([("", 5)], "host string, budget_per_round int")
    metrics = run_crawl(
        spark, str(tmp_path / "wd2"), pages, seeds, robots, budgets,
        CrawlConfig(max_rounds=3),
    )
    state = CrawlState(str(tmp_path / "wd2"))
    dead_rows = state.read_all(spark, "fetch_log").filter(F.col("status") == "dead")
    assert dead_rows.count() == 1  # logged once, never retried
    assert all(m.retried == 0 for m in metrics)
