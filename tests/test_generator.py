"""Generator determinism: same (seed, id) -> same row, regardless of
partitioning — the property that makes pytest-scale and bench-scale corpora
the same distribution."""

from pyspark.sql import functions as F

from data_collector_spark.functions.extract import extract_text_series
from data_collector_spark.functions.urls import canonicalize_url
from data_collector_spark.sources.generator import synth_pages, synth_seeds


def test_partition_independent(spark):
    a = synth_pages(spark, 200, n_hosts=8, partitions=2).orderBy("url_canon").collect()
    b = synth_pages(spark, 200, n_hosts=8, partitions=7).orderBy("url_canon").collect()
    assert len(a) == 200
    assert [r["url"] for r in a] == [r["url"] for r in b]
    assert [bytes(r["html"]) for r in a] == [bytes(r["html"]) for r in b]
    assert [r["warc_ts"] for r in a] == [r["warc_ts"] for r in b]


def test_golden_text_matches_extraction(spark):
    rows = synth_pages(spark, 100, n_hosts=5, partitions=3).collect()
    import pandas as pd

    got = extract_text_series(pd.Series([bytes(r["html"]) for r in rows]))
    assert list(got) == [r["text"] for r in rows]


def test_raw_url_canonicalizes_to_url_canon(spark):
    rows = synth_pages(spark, 150, n_hosts=5, partitions=2).collect()
    for r in rows:
        assert canonicalize_url(r["url"]) == r["url_canon"]


def test_host_skew(spark):
    df = synth_pages(spark, 1000, n_hosts=20, zipf_alpha=2.0, partitions=4)
    counts = (
        df.groupBy(F.regexp_extract("url_canon", r"http://([^/]+)/", 1).alias("h"))
        .count()
        .orderBy(F.desc("count"))
        .collect()
    )
    # hot host holds ~sqrt(1/20)=22% — 4x the uniform share; many hosts exist
    assert counts[0]["count"] > 1000 * 0.15
    assert len(counts) >= 10


def test_seeds_deterministic(spark):
    s1 = synth_seeds(spark, 200, n_hosts=8).collect()
    s2 = synth_seeds(spark, 200, n_hosts=8).collect()
    assert s1 == s2
    assert len(s1) == 10
