"""The catalog-adapter seam: a custom RoundTableIO injected via
CrawlState(workdir, io=...) must carry EVERY physical table operation of a
real crawl (so an Iceberg adapter implementing the four methods is
sufficient), and the crawl through it must equal the default scheme."""

from pyspark.sql import functions as F

from data_collector_spark.crawler.driver import CrawlConfig, run_crawl
from data_collector_spark.crawler.state import CrawlState, RoundTableIO
from data_collector_spark.sources.generator import (
    synth_pages,
    synth_politeness,
    synth_robots,
    synth_seeds,
)


class RecordingIO(RoundTableIO):
    """Parquet-backed adapter that logs every call — the no-op-adapter
    proof that the seam is the complete physical-IO surface."""

    def __init__(self, state):
        super().__init__(state)
        self.calls: list[tuple[str, str, int | None]] = []

    def write_round(self, table, round_n, df):
        self.calls.append(("write", table, round_n))
        super().write_round(table, round_n, df)

    def append_round(self, table, round_n, df):
        self.calls.append(("append", table, round_n))
        super().append_round(table, round_n, df)

    def read_round_df(self, spark, table, round_n, schema):
        self.calls.append(("read", table, round_n))
        return super().read_round_df(spark, table, round_n, schema)

    def read_all_df(self, spark, table):
        self.calls.append(("read_all", table, None))
        return None  # delegate to the default composition


def _snap(spark, st):
    seen = sorted(r["url_sha1"] for r in st.read_all(spark, "seen").collect())
    log = sorted(
        (r["round"], r["host"], r["seq_in_host"] or -1, r["url_sha1"], r["status"])
        for r in st.read_all(spark, "fetch_log").collect()
    )
    return seen, log


def test_crawl_through_adapter_matches_default(spark, tmp_path):
    corpus_dir = str(tmp_path / "corpus")
    synth_pages(spark, 120, n_hosts=4, partitions=2).write.parquet(corpus_dir)
    pages = spark.read.parquet(corpus_dir)
    seeds = synth_seeds(spark, 120, n_hosts=4)
    robots, budgets = synth_robots(spark), synth_politeness(spark, 5)

    wd_a = str(tmp_path / "wd_default")
    run_crawl(spark, wd_a, pages, seeds, robots, budgets, CrawlConfig(max_rounds=2))

    wd_b = str(tmp_path / "wd_adapter")
    st_b = CrawlState(wd_b)
    st_b.io = RecordingIO(st_b)
    run_crawl(
        spark, wd_b, pages, seeds, robots, budgets,
        CrawlConfig(max_rounds=2), state=st_b,
    )

    assert _snap(spark, CrawlState(wd_a)) == _snap(spark, st_b)

    io = st_b.io
    writes = {(t, n) for op, t, n in io.calls if op == "write"}
    # every round table of a 2-round crawl flowed through the adapter
    for table in ("frontier", "seen", "pages_out", "fetch_log"):
        assert any(t == table for t, _ in writes), (table, sorted(writes))
    assert ("frontier", 0) in writes and ("frontier", 2) in writes
    reads = {(t, n) for op, t, n in io.calls if op == "read"}
    assert ("frontier", 0) in reads and ("frontier", 1) in reads
    assert any(op == "read_all" for op, _, _ in io.calls)
