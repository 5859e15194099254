"""Crawl checkpoint -> training corpus: the bridge between the engine's
two halves.

The reference ends at staged SQL tables ready for analytics
(/root/reference/src/actions/stage/, SURVEY.md §3.3); a web-text engine
ends at a training set. This composes the crawl output with the
training-data operators (exact dedup -> MinHash/LSH near-dedup ->
language/quality/length filters -> deterministic split) into one
DataFrame pipeline a user runs directly on a committed crawl workdir.

Scale shape: every stage is the already-scale-audited operator — content
hash groupBy, banded LSH equi-join (never all-pairs), codegen feature
columns, pure-hash split. Near-dup resolution is the standard greedy
pair-drop (keep the smaller doc id of each confirmed pair): one
anti-join, no iterative connected components — at 10^10 docs the
union-find closure would be an iterative-join job chain; greedy keeps
one representative per pairwise-confirmed duplicate at the cost of
occasionally dropping both endpoints of a chain (documented, test-pinned
behavior).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_collector_spark.crawler.state import CrawlState
from data_collector_spark.functions.sketches import word_hash_col
from data_collector_spark.functions.textstats import (
    lang_id_col,
    quality_score_col,
    token_count_col,
)


def latest_pages(spark: SparkSession, state: CrawlState) -> DataFrame:
    """One row per url from pages_out: the LATEST capture (recrawl may
    re-fetch a url in later rounds; max_by round keeps the newest text)."""
    pages = state.read_all(spark, "pages_out")
    if pages is None:
        raise ValueError(f"{state.workdir}: no committed pages_out rounds")
    return (
        pages.groupBy("url_sha1")
        .agg(
            F.max_by(
                F.struct("url_canon", "extracted_text", "warc_ts", "round"), "round"
            ).alias("_p")
        )
        .select(
            F.col("url_sha1").alias("doc_id"),
            F.col("_p.url_canon").alias("url_canon"),
            F.col("_p.extracted_text").alias("text"),
            F.col("_p.warc_ts").alias("warc_ts"),
        )
    )


def build_training_set(
    spark: SparkSession,
    workdir: str,
    lang: str | None = "en",
    min_quality: float = 0.5,
    min_tokens: int = 5,
    max_tokens: int = 100_000,
    near_dup_threshold: float = 0.5,
    n_perm: int = 32,
    bands: int = 8,
    train_pct: int = 90,
) -> DataFrame:
    """-> (doc_id, url_canon, text, lang_pred, quality, n_tok, split).

    Deterministic given the checkpoint: re-running yields the identical
    corpus (hash split, min-id dedup winners, no sampling anywhere).
    ``near_dup_threshold=0`` skips the MinHash stage (exact dedup only);
    ``lang=None`` keeps every language (the marker-word lang-ID emits
    'und' for texts with no known markers).
    """
    from data_collector_spark.functions.sketches import (
        estimated_jaccard,
        lsh_candidate_pairs,
        minhash_signatures,
        tokenize,
    )

    docs = latest_pages(spark, CrawlState(workdir))

    # 1. exact dedup on normalized content hash: keep min doc_id per text
    kept = (
        docs.groupBy(F.md5("text").alias("_h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    docs = docs.join(kept, "doc_id")

    # 2. MinHash/LSH near-dedup: confirmed pairs (est. Jaccard >= t) drop
    #    the larger id (greedy pair-drop; see module docstring)
    if near_dup_threshold > 0:
        words = tokenize(docs)
        sig = minhash_signatures(words, n_perm=n_perm)
        pairs = lsh_candidate_pairs(sig, n_perm=n_perm, bands=bands)
        near = estimated_jaccard(sig, pairs, n_perm=n_perm).filter(
            F.col("jaccard_est") >= near_dup_threshold
        )
        losers = near.select(F.col("b_id").alias("doc_id")).distinct()
        docs = docs.join(losers, "doc_id", "left_anti")

    # 3. feature columns + filters, one fused projection
    t = F.col("text")
    feats = docs.select(
        "doc_id", "url_canon", "text",
        lang_id_col(t).alias("lang_pred"),
        quality_score_col(t).alias("quality"),
        token_count_col(t).alias("n_tok"),
    )
    pred = (F.col("quality") >= min_quality) & F.col("n_tok").between(
        min_tokens, max_tokens
    )
    if lang is not None:
        pred = (F.col("lang_pred") == lang) & pred
    filtered = feats.filter(pred)

    # 4. deterministic hash split (reshuffle/append-stable, never sample())
    h = word_hash_col(F.col("doc_id"))
    return filtered.withColumn(
        "split", F.when(h % 100 < train_pct, "train").otherwise("val")
    )
