"""Streaming twins of dedup + politeness: the streamed results must match
the batch operators' semantics across multiple micro-batches (one drop
file per micro-batch via maxFilesPerTrigger=1)."""

import hashlib
import os
from datetime import datetime, timedelta

import pandas as pd

from data_collector_spark.streaming import (
    streaming_host_budget,
    streaming_seen_dedup,
)

SCHEMA = "url_sha1 string, host string, discovery_ts timestamp"


def _rows(urls, t0):
    return pd.DataFrame(
        {
            "url_sha1": [hashlib.sha1(u.encode()).hexdigest() for u in urls],
            "host": [u.split("/")[2] for u in urls],
            "discovery_ts": [t0 + timedelta(minutes=i) for i in range(len(urls))],
        }
    )


def _write_batches(spark, tmp_path, batches):
    d = tmp_path / "stream_src"
    os.makedirs(d, exist_ok=True)
    for i, pdf in enumerate(batches):
        spark.createDataFrame(pdf, SCHEMA).coalesce(1).write.mode("overwrite").parquet(
            str(d / f"b{i}")
        )
        # FileStreamSource wants flat drop-in files
        part = next(p for p in os.listdir(d / f"b{i}") if p.endswith(".parquet"))
        os.rename(d / f"b{i}" / part, d / f"drop-{i:03d}.parquet")
    return str(d)


def _run_stream(spark, src_dir, transform, name):
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    q = (
        transform(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {name}")


def test_streaming_seen_dedup_admits_each_key_once(spark, tmp_path):
    t0 = datetime(2024, 1, 1)
    b0 = _rows([f"http://h{i%2}.test/p/{i}" for i in (0, 1, 2, 0)], t0)  # dup in-batch
    b1 = _rows([f"http://h{i%2}.test/p/{i}" for i in (1, 3)], t0)       # dup cross-batch
    src = _write_batches(spark, tmp_path, [b0, b1])
    out = _run_stream(spark, src, streaming_seen_dedup, "seen_dedup_t").toPandas()
    # every sha exactly once; the union of distinct keys survives
    assert out["url_sha1"].is_unique
    expect = set(
        hashlib.sha1(f"http://h{i%2}.test/p/{i}".encode()).hexdigest()
        for i in (0, 1, 2, 3)
    )
    assert set(out["url_sha1"]) == expect


def test_streaming_host_budget_caps_across_batches(spark, tmp_path):
    t0 = datetime(2024, 1, 1)
    # h0 gets 3 urls in batch 0 and 2 in batch 1; budget 4 => last one deferred
    urls0 = [f"http://h0.test/p/{i}" for i in range(3)] + ["http://h1.test/p/9"]
    urls1 = [f"http://h0.test/p/{i}" for i in (7, 8)]
    src = _write_batches(spark, tmp_path, [_rows(urls0, t0), _rows(urls1, t0)])
    out = _run_stream(
        spark, src, lambda s: streaming_host_budget(s, budget=4), "budget_t"
    ).toPandas()
    h0 = out[out["host"] == "h0.test"]
    assert len(h0) == 5
    assert int(h0["admitted"].sum()) == 4  # cap enforced ACROSS micro-batches
    assert int(h0["spent_after"].max()) == 4
    # deterministic choice: within batch 1 the lower url_sha1 is admitted
    b1 = h0[h0["url_sha1"].isin(
        [hashlib.sha1(u.encode()).hexdigest() for u in urls1]
    )].sort_values("url_sha1")
    assert list(b1["admitted"]) == [True, False]
    h1 = out[out["host"] == "h1.test"]
    assert list(h1["admitted"]) == [True]
