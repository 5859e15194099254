"""Streaming/batch equivalence: the Structured Streaming tumbling-window
agg over the events parquet must produce exactly the batch twin's rows."""

from data_collector_spark.plans import QUERIES
from data_collector_spark.streaming import run_streaming_over_parquet


def test_streaming_matches_batch(spark, sf_dir):
    batch = QUERIES["st_tumbling_window"](spark, sf_dir)
    stream = run_streaming_over_parquet(spark, sf_dir)
    b = sorted(tuple(r) for r in batch.collect())
    s = sorted(tuple(r) for r in stream.collect())
    assert b == s and len(b) > 0
