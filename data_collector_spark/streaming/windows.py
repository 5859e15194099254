"""Structured Streaming surface.

The reference is batch-iterative (SURVEY.md §2.11): its closest streaming
analogs are calendar-windowed request ranges and 10k-row cursor chunks,
and late/duplicate data is absorbed by PK upserts. The engine's crawl
rounds keep that model. This module provides the genuine streaming twin
for the windowed-aggregation operator so stream sources (kafka, file
drops) plug in without changing query semantics: the batch query
(plans/training.py::st_tumbling_window) and this streaming one share the
same window expression, and pytest asserts they produce identical rows
when the stream is driven from the same parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def streaming_tumbling_counts(events: DataFrame) -> DataFrame:
    """1h tumbling event-time window + 2h watermark for late data."""
    return (
        events.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "sum_value")
    )


def run_streaming_over_parquet(
    spark: SparkSession, sf_dir: str, query_name: str = "dcs_stream_out"
) -> DataFrame:
    """Drive the streaming agg from the events parquet to completion
    (memory sink, complete mode) and return the result as a DataFrame."""
    import shutil
    import tempfile

    batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    # FileStreamSource needs a directory of drop-in files
    stream_dir = tempfile.mkdtemp(prefix="dcs_stream_src_")
    shutil.copy(f"{sf_dir}/events.parquet", f"{stream_dir}/events-000.parquet")
    stream = spark.readStream.schema(batch.schema).parquet(stream_dir)
    agg = streaming_tumbling_counts(
        stream.withColumn("ts", F.col("ts").cast("timestamp"))
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {query_name}")
