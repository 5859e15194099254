"""Deterministic synthetic Common-Crawl-style corpus (FIXTURES.md §A).

Replaces the reference's HTTP endpoints + httpmock test servers
(/root/reference/src/actions/collect/nyse_events.rs:533-582): "fetching" a
URL = joining against this table. Every value is a pure function of
(seed, row id) via splitmix64, so generation is partition-independent and
reproducible at any scale — the pytest corpus and the bench corpus are the
same distribution.

Skew: hosts are assigned zipf-ishly (host 0 is hot) because explicit skew
handling is a north_rule requirement the reference never needed (its cursor
walks one symbol at a time, /root/reference/src/database/
master_data_service.rs:77-90).
"""

from __future__ import annotations

from collections.abc import Iterator
from datetime import datetime, timezone

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_collector_spark.functions.extract import extract_text_series

_VOCAB = (
    "spark frontier crawl page link host fetch queue round bloom filter "
    "politeness budget depth priority snapshot shuffle partition skew salt "
    "anchor text token batch arrow vector column hash merge dedup seen"
).split()
_LANGS = np.array(["en", "en", "en", "en", "en", "en", "en", "de", "fr", "es", "zh"])
_EPOCH = datetime(2024, 1, 1, tzinfo=timezone.utc)

GOLDEN_MASK = np.uint64(0xFFFFFFFFFFFFFFFF)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 — the one PRNG for all derived values."""
    z = (x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)) & GOLDEN_MASK
    z = ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & GOLDEN_MASK
    z = ((z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & GOLDEN_MASK
    return z ^ (z >> np.uint64(31))


def _rand(ids: np.ndarray, stream: int, seed: int) -> np.ndarray:
    return _splitmix64(ids * np.uint64(1_000_003) + np.uint64(stream * 7919 + seed))


def _host_of(ids: np.ndarray, n_hosts: int, zipf_alpha: float, seed: int) -> np.ndarray:
    """Zipf-ish host assignment: u^alpha concentrates mass on host 0."""
    u = _rand(ids, 1, seed).astype(np.float64) / 2**64
    return np.minimum((n_hosts * np.power(u, zipf_alpha)).astype(np.int64), n_hosts - 1)


def url_of(i: int, n_hosts: int, zipf_alpha: float, seed: int) -> str:
    h = _host_of(np.array([i], dtype=np.uint64), n_hosts, zipf_alpha, seed)[0]
    return f"http://h{h}.test/p/{i}"


def _make_batch(
    ids: np.ndarray,
    n_urls: int,
    n_hosts: int,
    zipf_alpha: float,
    links_per_page: int,
    dead_frac: float,
    seed: int,
    min_words: int = 8,
    max_words: int = 33,
) -> pd.DataFrame:
    ids = ids.astype(np.uint64)
    hosts = _host_of(ids, n_hosts, zipf_alpha, seed)

    # raw stored URLs include non-canonical variants (uppercase host,
    # trailing slash, fragment, default port) to exercise canonicalization
    variant = _rand(ids, 2, seed) % np.uint64(8)
    urls, raw_urls = [], []
    for i, h, v in zip(ids.tolist(), hosts.tolist(), variant.tolist()):
        canon = f"http://h{h}.test/p/{i}"
        urls.append(canon)
        if v == 0:
            raw_urls.append(f"HTTP://H{h}.test/p/{i}")
        elif v == 1:
            raw_urls.append(canon + "/")
        elif v == 2:
            raw_urls.append(canon + "#frag")
        elif v == 3:
            raw_urls.append(f"http://h{h}.test:80/p/{i}")
        else:
            raw_urls.append(canon)

    # body words from vocab; link targets skewed toward low ids so the
    # reachable graph is dense; ~dead_frac of links point past the universe
    span = max(1, max_words - min_words)
    n_words = min_words + (_rand(ids, 3, seed) % np.uint64(span)).astype(np.int64)
    htmls = []
    universe = int(n_urls * (1.0 + dead_frac))
    for idx, (i, h) in enumerate(zip(ids.tolist(), hosts.tolist())):
        wseed = _rand(np.arange(n_words[idx], dtype=np.uint64) + np.uint64(i), 4, seed)
        words = " ".join(_VOCAB[int(w % len(_VOCAB))] for w in wseed)
        tgt = _rand(np.arange(links_per_page, dtype=np.uint64) + np.uint64(i * 31), 5, seed)
        tgt_ids = (tgt % np.uint64(universe)).astype(np.int64)
        anchors = []
        for j, t in enumerate(tgt_ids.tolist()):
            th = _host_of(np.array([t], dtype=np.uint64), n_hosts, zipf_alpha, seed)[0]
            anchors.append(f'<a href="http://h{th}.test/p/{t}">link {j}</a>')
        html = (
            f"<html><head><title>Page {i}</title>"
            f"<script>var x = {i};</script></head>"
            f"<body><h1>Page {i} on h{h}</h1><!-- c{i} -->"
            f"<p>{words} &amp; more</p>" + " ".join(anchors) + "</body></html>"
        )
        htmls.append(html.encode("utf-8"))

    ts = [_EPOCH + pd.Timedelta(seconds=int(x % np.uint64(7 * 86400))) for x in _rand(ids, 6, seed)]
    langs = _LANGS[(_rand(ids, 7, seed) % np.uint64(len(_LANGS))).astype(np.int64)]
    text = extract_text_series(pd.Series(htmls))  # golden extraction
    return pd.DataFrame(
        {
            "url": raw_urls,
            "warc_ts": pd.Series(ts).dt.tz_localize(None),
            "html": htmls,
            "text": text.values,
            "lang": langs,
            "url_canon": urls,
        }
    )


PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string, url_canon string"


def synth_pages(
    spark: SparkSession,
    n_urls: int,
    n_hosts: int = 20,
    zipf_alpha: float = 2.0,
    links_per_page: int = 5,
    dead_frac: float = 0.05,
    seed: int = 42,
    partitions: int | None = None,
    min_words: int = 8,
    max_words: int = 33,
) -> DataFrame:
    """Distributed deterministic pages table (input_hint schema + url_canon)."""
    rng = spark.range(0, n_urls, 1, partitions or spark.sparkContext.defaultParallelism)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _make_batch(
                pdf["id"].to_numpy(), n_urls, n_hosts, zipf_alpha,
                links_per_page, dead_frac, seed, min_words, max_words,
            )

    return rng.mapInPandas(gen, schema=PAGES_SCHEMA)


def synth_seeds(
    spark: SparkSession,
    n_urls: int,
    n_hosts: int = 20,
    zipf_alpha: float = 2.0,
    n_seeds: int = 10,
    seed: int = 42,
) -> DataFrame:
    """Seed list: first ids spread over hosts + one dead URL (FIXTURES A2)."""
    ids = np.arange(n_seeds - 1, dtype=np.uint64) * np.uint64(max(1, n_urls // n_seeds))
    rows = [(url_of(int(i), n_hosts, zipf_alpha, seed), 0) for i in ids]
    rows.append((f"http://h1.test/p/{n_urls + 12345}", 0))  # dead seed
    return spark.createDataFrame(rows, "url string, priority int")


def synth_robots(spark: SparkSession, seed: int = 42) -> DataFrame:
    """Disallow table: h3 fully blocked, h2's /p/1* subtree blocked (A3)."""
    rows = [
        ("h3.test", "", datetime(2024, 1, 1)),
        ("h2.test", "/p/1", datetime(2024, 1, 1)),
    ]
    return spark.createDataFrame(rows, "host string, path_prefix string, checked_ts timestamp")


def synth_politeness(spark: SparkSession, default_budget: int = 2) -> DataFrame:
    """Per-host per-round budgets; '' row = default (A4). Hot host h0 capped at 1."""
    rows = [("", default_budget), ("h0.test", 1)]
    return spark.createDataFrame(rows, "host string, budget_per_round int")


def pages_from_documents(spark: SparkSession, sf_dir: str, n_hosts: int = 10) -> DataFrame:
    """Map the driver-provided documents table into the pages shape.

    Lets the flagship crawl run directly over /root/testdata without
    synthesizing a parallel corpus: url = f(doc_id), html wraps the doc
    text with 3 deterministic links, golden text = shared extraction.
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = docs.count()

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["doc_id"].to_numpy(np.uint64)
            hosts = (ids % np.uint64(n_hosts)).astype(np.int64)
            urls = [f"http://d{h}.docs.test/d/{i}" for i, h in zip(ids.tolist(), hosts.tolist())]
            htmls = []
            for i, (did, body) in enumerate(zip(ids.tolist(), pdf["text"].tolist())):
                tgt = _rand(np.arange(3, dtype=np.uint64) + np.uint64(did * 17), 9, 42)
                anchors = " ".join(
                    f'<a href="http://d{int(t % np.uint64(n_docs)) % n_hosts}.docs.test/d/{int(t % np.uint64(n_docs))}">r</a>'
                    for t in tgt
                )
                htmls.append(
                    f"<html><head><title>Doc {did}</title></head><body><p>{body}</p>{anchors}</body></html>".encode()
                )
            ts = [_EPOCH + pd.Timedelta(seconds=int(i)) for i in ids.tolist()]
            yield pd.DataFrame(
                {
                    "url": urls,
                    "warc_ts": pd.Series(ts).dt.tz_localize(None),
                    "html": htmls,
                    "text": extract_text_series(pd.Series(htmls)).values,
                    "lang": pdf["lang"].values,
                    "url_canon": urls,
                }
            )

    return docs.mapInPandas(gen, schema=PAGES_SCHEMA)
