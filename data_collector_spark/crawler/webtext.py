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
columns, pure-hash split. Near-dup resolution is selectable:

- ``resolution="greedy"`` (default): drop the larger doc id of each
  confirmed pair — one anti-join, no iteration. On duplicate CHAINS it
  can drop a doc whose only kept "representative" was itself dropped
  (A<B<C with pairs A~B, B~C loses both B and C while only A survives),
  and can over-keep a transitive dup whose direct pairs all point at
  larger ids (pairs A~C, B~C keep both A and B). Documented, test-pinned.
- ``resolution="components"``: iterative min-label propagation over the
  confirmed-pair graph to convergence — each iteration is ONE self-join
  (+ a bounded groupBy), iteration count = component diameter (near-dup
  components are shallow: pairs confirmed at Jaccard >= t cluster
  tightly), hard-capped at ``components_max_iters``. Keeps exactly the
  component-minimum doc id per connected component.
"""

from __future__ import annotations

import os

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


def near_dup_losers(
    near: DataFrame,
    resolution: str = "greedy",
    max_iters: int = 20,
    materialize_path: str | None = None,
) -> DataFrame:
    """Confirmed near-dup pairs (a_id, b_id with a_id < b_id) -> the
    (doc_id) rows to DROP, per the chosen resolution (module docstring).

    Components mode: min-label propagation — labels start as own id;
    each round every node takes the min label among itself and its
    neighbors; converged when nothing changes (checked with a LIMIT 1
    existence probe, not a full count). Losers = nodes whose final label
    is not their own id, i.e. everything but each component's minimum.
    Exhausting ``max_iters`` before convergence raises a RuntimeWarning
    (partial labels over-keep representatives in wide components).

    Cache hygiene (ADVICE r4): the iteration persists edges + the running
    labels; the LOSER SET must be materialized BEFORE those caches are
    released or the caller's lazy anti-join would recompute label
    partitions through the unpersisted lineage. With ``materialize_path``
    the losers are written there as parquet and read back (zero caches
    survive the call — the scale shape, one bounded id table on storage);
    without it the losers stay persist()-ed and the CALLER owns the
    eventual unpersist.
    """
    if resolution == "greedy":
        return near.select(F.col("b_id").alias("doc_id")).distinct()
    if resolution != "components":
        raise ValueError(f"unknown near-dup resolution: {resolution!r}")
    edges = near.select(F.col("a_id").alias("src"), F.col("b_id").alias("dst"))
    edges = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).persist()
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .persist()
    )
    converged = False
    for _ in range(max_iters):
        prop = edges.join(
            labels.select(F.col("id").alias("dst"), F.col("label")), "dst"
        ).select(F.col("src").alias("id"), "label")
        new = (
            labels.unionByName(prop)
            .groupBy("id")
            .agg(F.min("label").alias("label"))
            .persist()
        )
        changed = (
            new.join(labels.select("id", F.col("label").alias("_old")), "id")
            .filter(F.col("label") < F.col("_old"))
            .limit(1)
            .count()
        )
        labels.unpersist()
        labels = new
        if changed == 0:
            converged = True
            break
    if not converged:
        # A component whose diameter exceeds max_iters leaves partial
        # labels: sub-chain endpoints still carrying their own id would be
        # silently KEPT as extra "representatives". Surface it — callers
        # raise max_iters (each extra iteration is one bounded Spark job).
        import warnings

        warnings.warn(
            f"near_dup_losers(components): label propagation did not "
            f"converge within max_iters={max_iters}; some components wider "
            f"than {max_iters} hops may retain more than one representative. "
            f"Re-run with a larger max_iters.",
            RuntimeWarning,
            stacklevel=2,
        )
    losers = labels.filter(F.col("label") != F.col("id")).select(
        F.col("id").alias("doc_id")
    )
    if materialize_path is not None:
        losers.write.mode("overwrite").parquet(materialize_path)
        labels.unpersist()
        edges.unpersist()
        return near.sparkSession.read.parquet(materialize_path)
    losers = losers.persist()
    losers.count()  # materialize through the still-live caches
    labels.unpersist()
    edges.unpersist()
    return losers


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
    resolution: str = "greedy",
    components_max_iters: int = 20,
    benchmark: DataFrame | None = None,
    decontam_ngram: int = 13,
    max_dup_word_frac: float | None = None,
    max_top_2gram_frac: float | None = None,
    pack_budget: int | None = None,
) -> DataFrame:
    """-> (doc_id, url_canon, text, lang_pred, quality, n_tok, split
    [, start_tok, chunk_first, chunk_last]).

    Deterministic given the checkpoint: re-running yields the identical
    corpus (hash split, min-id dedup winners, no sampling anywhere).
    ``near_dup_threshold=0`` skips the MinHash stage (exact dedup only);
    ``lang=None`` keeps every language (the marker-word lang-ID emits
    'und' for texts with no known markers); ``resolution`` picks the
    near-dup pair resolution (module docstring: "greedy" one-shot vs
    "components" chain-safe min-label propagation).

    Optional stages (all off by default, r5): ``benchmark`` — a
    (doc_id, text) DataFrame of held-out eval documents; any doc sharing
    a distinct ``decontam_ngram``-gram with it is dropped (the GPT-3/Pile
    eval-overlap rule). ``max_dup_word_frac`` / ``max_top_2gram_frac`` —
    Gopher-style repetition caps (docs above either fraction are
    boilerplate/spam). ``pack_budget`` — append the concat-and-chunk
    token span + chunk range columns at that max_seq_len, packed PER
    SPLIT (train and val are separate streams, so no chunk straddles the
    split and leaks val tokens into training batches; zero-token docs
    get NULL spans — packing appends columns, never changes membership).

    Source mixing (per-source sampling/upsampling weights) composes
    DOWNSTREAM of this bridge rather than inside it — selection here,
    distribution composition after: derive a source column (e.g. host
    from url_canon) and apply ``functions.mixing.mix_sources`` to the
    train split (test_webtext.py pins the composition).
    """
    from data_collector_spark.functions.sketches import (
        lsh_near_pairs,
        minhash_signatures,
        raw_words,
    )

    docs = latest_pages(spark, CrawlState(workdir))

    # 1. exact dedup on normalized content hash: keep min doc_id per text
    kept = (
        docs.groupBy(F.md5("text").alias("_h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    docs = docs.join(kept, "doc_id")

    # 2. MinHash/LSH near-dedup: confirmed pairs (est. Jaccard >= t)
    #    resolve to losers per the chosen strategy (module docstring)
    if near_dup_threshold > 0:
        # raw occurrences: min() is multiplicity-invariant (r7, one less
        # word-table shuffle than tokenize()'s distinct)
        words = raw_words(docs)
        sig = minhash_signatures(words, n_perm=n_perm)
        # fused signature-level candidates + first-band dedup + verify
        # (r7, result-identical to lsh_candidate_pairs+estimated_jaccard)
        near = lsh_near_pairs(
            sig, n_perm=n_perm, bands=bands, threshold=near_dup_threshold
        )
        # components mode materializes its loser set to a side table under
        # the workdir so no iteration cache outlives this call (the
        # returned pipeline is lazy — a persisted-DataFrame dependency
        # would leak for the session, ADVICE r4)
        losers = near_dup_losers(
            near, resolution, components_max_iters,
            materialize_path=(
                os.path.join(workdir, "_neardup_losers")
                if resolution == "components"
                else None
            ),
        )
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

    # Every optional stage below re-reads `filtered` (its aggregation
    # joins back onto the pipeline), and in greedy mode the near-dedup
    # lineage above is lazy — composing the stages naively would re-derive
    # the groupBy + MinHash/LSH chain once PER STAGE. Materialize the
    # filtered survivors to a workdir side table first (the same pattern
    # as the components loser set: storage, not a session-leaking cache).
    if (
        max_dup_word_frac is not None
        or max_top_2gram_frac is not None
        or benchmark is not None
        or pack_budget is not None
    ):
        snap = os.path.join(workdir, "_training_filtered")
        filtered.write.mode("overwrite").parquet(snap)
        filtered = spark.read.parquet(snap)

    # 3b. optional repetition caps (Gopher word-level rules): one
    #     exploded-aggregation pass joined back as extra predicates —
    #     LEFT-join semantics so empty/whitespace-only docs admitted by
    #     min_tokens=0 pass through (ADVICE r5; pinned in test_textstats)
    if max_dup_word_frac is not None or max_top_2gram_frac is not None:
        from data_collector_spark.functions.textstats import apply_repetition_caps

        filtered = apply_repetition_caps(
            filtered, max_dup_word_frac, max_top_2gram_frac
        )

    # 3c. optional benchmark decontamination: drop docs sharing a distinct
    #     n-gram with the eval set (broadcast gram probe)
    if benchmark is not None:
        from data_collector_spark.functions.sketches import contaminated_docs

        contam = contaminated_docs(
            filtered.select("doc_id", "text"), benchmark, n=decontam_ngram
        ).select("doc_id")
        filtered = filtered.join(contam, "doc_id", "left_anti")

    # 4. deterministic hash split (reshuffle/append-stable, never sample())
    h = word_hash_col(F.col("doc_id"))
    out = filtered.withColumn(
        "split", F.when(h % 100 < train_pct, "train").otherwise("val")
    )

    # 5. optional sequence packing: token span + chunk range columns.
    #    Packed PER SPLIT (each split is its own stream) so no chunk ever
    #    straddles train/val — a straddling chunk would leak val tokens
    #    into training batches. LEFT join: zero-token docs admitted by
    #    min_tokens=0 keep their rows with NULL spans (packing appends
    #    columns, never changes membership).
    if pack_budget is not None:
        from data_collector_spark.functions.packing import pack_sequences

        spans = pack_sequences(
            out.select("doc_id", "text", "split"),
            budget=pack_budget,
            partition_col="split",
        )
        out = out.join(spans, "doc_id", "left")
    return out
