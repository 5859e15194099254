"""Document-dedup sketches: MinHash+LSH, SimHash — JVM-side end to end.

Not in the reference (its dedup is exact PK conflict, SURVEY.md S7); these
are the near-dup operators a web-text training pipeline needs at 100 TB,
where exact-pair comparison is O(n^2) and infeasible. Design:

- token/shingle hashing uses built-in ``xxhash64(col, seed)`` so the hot
  path stays inside whole-stage codegen — no Python worker at all;
- MinHash: one groupBy computes all P permutations as min-aggregates;
  LSH bands turn signature equality into an equi-join (shuffle on band
  key), so candidate generation scales like a hash join, not a cross join;
- SimHash: 64 bit-majority aggregates per doc, banded the same way, with
  ``bit_count(xor)`` Hamming verification.

Both verify candidates exactly (Jaccard / Hamming) — the sketches only
bound the candidate set, mirroring the engine's Bloom-then-anti-join rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tokenize(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Distinct (id, word) pairs — the shingle table."""
    return (
        docs.select(id_col, F.explode(F.split(text_col, r"\s+")).alias("word"))
        .filter(F.col("word") != "")
        .distinct()
    )


def minhash_signatures(words: DataFrame, n_perm: int = 32, id_col: str = "doc_id") -> DataFrame:
    """One row per doc: h0..h{P-1} minhash signature (P min-aggregates,
    one shuffle)."""
    aggs = [
        F.min(F.xxhash64("word", F.lit(i))).alias(f"h{i}") for i in range(n_perm)
    ]
    return words.groupBy(id_col).agg(*aggs)


def lsh_candidate_pairs(
    sig: DataFrame, n_perm: int = 32, bands: int = 8, id_col: str = "doc_id"
) -> DataFrame:
    """(a_id, b_id) candidate pairs: equal signature slice in >=1 band.

    Band rows are exploded then self-equi-joined on (band, key) — at scale
    this is a shuffle join on the band key, never a cross join.
    """
    rows_per_band = n_perm // bands
    band_cols = []
    for b in range(bands):
        cols = [f"h{b * rows_per_band + i}" for i in range(rows_per_band)]
        band_cols.append(
            F.struct(F.lit(b).alias("band"), F.xxhash64(*cols).alias("key"))
        )
    banded = sig.select(
        F.col(id_col), F.explode(F.array(*band_cols)).alias("bk")
    ).select(id_col, F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("a_id"), F.col(f"b.{id_col}").alias("b_id"))
        .distinct()
    )


def exact_jaccard(words: DataFrame, pairs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Exact word-set Jaccard for the given (a_id, b_id) pairs."""
    sizes = words.groupBy(id_col).agg(F.count("*").alias("n"))
    wa = words.select(F.col(id_col).alias("a_id"), "word")
    wb = words.select(F.col(id_col).alias("b_id"), "word")
    inter = (
        pairs.join(wa, "a_id")
        .join(wb, ["b_id", "word"])
        .groupBy("a_id", "b_id")
        .agg(F.count("*").alias("c"))
    )
    return (
        inter.join(sizes.select(F.col(id_col).alias("a_id"), F.col("n").alias("na")), "a_id")
        .join(sizes.select(F.col(id_col).alias("b_id"), F.col("n").alias("nb")), "b_id")
        .select(
            "a_id",
            "b_id",
            (F.col("c") / (F.col("na") + F.col("nb") - F.col("c"))).alias("jaccard"),
        )
    )


def estimated_jaccard(
    sig: DataFrame,
    pairs: DataFrame,
    n_perm: int = 32,
    id_col: str = "doc_id",
    broadcast_sig: bool = True,
) -> DataFrame:
    """Signature-based Jaccard estimate: fraction of agreeing minhashes.

    O(pairs x n_perm) — the verification step for LSH candidates at scale,
    where exact word-set intersection (O(pairs x |doc|)) melts down on
    near-dup-heavy corpora (every pair a spam cluster produces is a true
    candidate, so the exact join multiplies millions of pairs by document
    length)."""
    arr = F.array(*[f"h{i}" for i in range(n_perm)])
    sa = sig.select(F.col(id_col).alias("a_id"), arr.alias("siga"))
    sb = sig.select(F.col(id_col).alias("b_id"), arr.alias("sigb"))
    if broadcast_sig:
        # pairs >> docs in near-dup-heavy corpora: keep the pair stream
        # unshuffled and broadcast the signature table to both probes
        # (at 10^10 docs pass False — the join shuffles on id instead)
        sa, sb = F.broadcast(sa), F.broadcast(sb)
    agree = F.aggregate(
        F.zip_with("siga", "sigb", lambda x, y: F.when(x == y, 1).otherwise(0)),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    return (
        pairs.join(sa, "a_id")
        .join(sb, "b_id")
        .select("a_id", "b_id", (agree / F.lit(n_perm)).alias("jaccard_est"))
    )


def simhash(words_counted: DataFrame, id_col: str = "doc_id", bits: int = 64) -> DataFrame:
    """64-bit SimHash per doc from (id, word, cnt) rows.

    Bit-majority as 64 conditional-sum aggregates over xxhash64(word) —
    all codegen'd; the per-bit sums recombine into one BIGINT column.
    """
    h = F.xxhash64("word")
    aggs = [
        F.sum(
            F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, F.col("cnt")).otherwise(
                -F.col("cnt")
            )
        ).alias(f"b{i}")
        for i in range(bits)
    ]
    per_bit = words_counted.groupBy(id_col).agg(*aggs)
    sim = None
    for i in range(bits):
        # two's complement: the top bit contributes Long.MIN_VALUE
        weight = -(1 << 63) if i == bits - 1 and bits == 64 else (1 << i)
        term = F.when(F.col(f"b{i}") > 0, F.lit(weight).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        sim = term if sim is None else (sim + term)
    return per_bit.select(id_col, sim.alias("simhash"))


def simhash_near_pairs(
    sigs: DataFrame, max_hamming: int = 3, id_col: str = "doc_id"
) -> DataFrame:
    """Near-dup pairs by Hamming distance <= k, banded 4x16 bits.

    Pigeonhole: hamming<=3 over 4 bands guarantees one band matches
    exactly, so candidates come from an equi-join on (band, 16-bit slice).
    """
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.shiftright("simhash", b * 16).bitwiseAND(F.lit(0xFFFF)).alias("key"),
        )
        for b in range(4)
    ]
    banded = sigs.select(
        id_col, "simhash", F.explode(F.array(*band_cols)).alias("bk")
    ).select(id_col, "simhash", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("a_id"),
            F.col(f"b.{id_col}").alias("b_id"),
            F.col("a.simhash").alias("sa"),
            F.col("b.simhash").alias("sb"),
        )
        .distinct()
    )
    return cand.select(
        "a_id",
        "b_id",
        F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))).alias("hamming"),
    ).filter(F.col("hamming") <= max_hamming)
