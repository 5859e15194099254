"""r7 sketch-path rewrite: the fused signature-level LSH/simhash pair
generators must be result-identical to the naive doc-level compositions
they replaced (band join + pair DISTINCT + signature-join verify), in
both the broadcast and shuffle expansion regimes."""

import pytest
from pyspark.sql import functions as F

from data_collector_spark.functions.sketches import (
    SIMHASH_BANDS,
    SIMHASH_BITS,
    estimated_jaccard,
    lsh_candidate_pairs,
    lsh_near_pairs,
    minhash_signatures,
    simhash,
    simhash_near_pairs,
    tokenize,
)


def _corpus(spark):
    """Synthetic corpus exercising every regime the rewrite changed:
    exact-duplicate texts (identical signatures -> the same-signature
    fast path), near-dups (cross-signature confirmed pairs), shared-band
    non-dups (candidates that fail verification), and disjoint docs."""
    base = " ".join(f"w{i}" for i in range(40))
    near = " ".join(f"w{i}" for i in range(38)) + " x1 x2"
    rows = [
        (1, base), (2, base), (3, base),          # identical cluster
        (4, near), (5, near),                      # identical pair, near base
        (6, " ".join(f"w{i}" for i in range(20))),  # subset overlap
        (7, " ".join(f"z{i}" for i in range(30))),  # disjoint
        (8, " ".join(f"z{i}" for i in range(30))),  # identical to 7
        (9, "only one word"),
        (10, ""),                                   # wordless: no signature
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _naive_minhash(docs, threshold):
    words = tokenize(docs)
    sig = minhash_signatures(words, n_perm=32)
    cand = lsh_candidate_pairs(sig, n_perm=32, bands=8)
    return (
        estimated_jaccard(sig, cand, n_perm=32)
        .filter(F.col("jaccard_est") >= threshold)
    )


def _naive_simhash(sigs, max_hamming):
    width = SIMHASH_BITS // SIMHASH_BANDS
    mask = (1 << width) - 1
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.shiftright("simhash", b * width).bitwiseAND(F.lit(mask)).alias("key"),
        )
        for b in range(SIMHASH_BANDS)
    ]
    banded = sigs.select(
        "doc_id", "simhash", F.explode(F.array(*band_cols)).alias("bk")
    ).select("doc_id", "simhash", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id"),
            F.col("a.simhash").alias("sa"), F.col("b.simhash").alias("sb"),
        )
        .distinct()
    )
    return cand.select(
        "a_id", "b_id",
        F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))).alias("hamming"),
    ).filter(F.col("hamming") <= max_hamming)


def _rows(df):
    return sorted(map(tuple, df.collect()))


@pytest.mark.parametrize("threshold", [0.5, 0.25, 1.0])
@pytest.mark.parametrize("broadcast_docs", [True, False])
def test_lsh_near_pairs_matches_naive_composition(spark, threshold, broadcast_docs):
    docs = _corpus(spark)
    expected = _rows(_naive_minhash(docs, threshold))
    sig = minhash_signatures(tokenize(docs), n_perm=32)
    got = _rows(
        lsh_near_pairs(
            sig, n_perm=32, bands=8, threshold=threshold,
            broadcast_docs=broadcast_docs,
        )
    )
    assert got == expected
    # the identical-text clusters must all be in any threshold<=1 result
    if threshold <= 1.0:
        pairs = {(a, b) for a, b, _ in got}
        assert {(1, 2), (1, 3), (2, 3), (4, 5), (7, 8)} <= pairs


def test_lsh_near_pairs_emits_each_pair_once(spark):
    """The first-matching-band predicate must reproduce the DISTINCT the
    naive path paid a quadratic shuffle for: no pair appears twice even
    when signatures collide in several bands (identical texts collide in
    ALL 8)."""
    docs = _corpus(spark)
    sig = minhash_signatures(tokenize(docs), n_perm=32)
    out = lsh_near_pairs(sig, n_perm=32, bands=8, threshold=0.0)
    dups = (
        out.groupBy("a_id", "b_id").agg(F.count("*").alias("n"))
        .filter(F.col("n") > 1).collect()
    )
    assert dups == []


@pytest.mark.parametrize("broadcast_docs", [True, False])
def test_simhash_near_pairs_matches_naive_composition(spark, broadcast_docs):
    docs = _corpus(spark)
    counted = (
        docs.select("doc_id", F.explode(F.split("text", r"\s+")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("doc_id", "word")
        .agg(F.count("*").alias("cnt"))
    )
    sigs = simhash(counted)
    expected = _rows(_naive_simhash(sigs, 3))
    got = _rows(simhash_near_pairs(sigs, max_hamming=3, broadcast_docs=broadcast_docs))
    assert got == expected
    pairs = {(a, b) for a, b, _ in got}
    assert {(1, 2), (1, 3), (2, 3), (4, 5), (7, 8)} <= pairs
