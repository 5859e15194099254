"""Document-dedup sketches: MinHash+LSH, SimHash — JVM-side end to end.

Not in the reference (its dedup is exact PK conflict, SURVEY.md S7); these
are the near-dup operators a web-text training pipeline needs at 100 TB,
where exact-pair comparison is O(n^2) and infeasible. Design:

- the word base hash is the first 15 hex digits of ``md5(word)`` (a 60-bit
  int via ``conv``), and MinHash permutations are universal hashes
  (a*x + b) mod (2^31-1) over it with fixed splitmix64-derived (a, b) —
  ONE cryptographic hash per word and 32 cheap modular transforms, all
  whole-stage-codegen, and — unlike xxhash64 — bit-for-bit reproducible in
  ANSI SQL, so the DuckDB oracle can replay the exact sketch;
- MinHash: one groupBy computes all P permutations as min-aggregates;
  LSH bands turn signature equality into an equi-join (shuffle on band
  key), so candidate generation scales like a hash join, not a cross join;
- SimHash: 60 bit-majority aggregates per doc (60 bits = the md5 slice,
  keeping every value positive in a signed 64-bit int on both engines),
  banded 4 x 15 bits, with ``bit_count(xor)`` Hamming verification.

Both verify candidates from the signatures only — the sketches bound the
candidate set AND the verification cost, mirroring the engine's
Bloom-then-anti-join rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_collector_spark.functions.detrand import MINHASH_P, minhash_params

SIMHASH_BITS = 60
SIMHASH_BANDS = 4  # 15 bits each; pigeonhole covers hamming <= 3


def word_hash_col(col) -> F.Column:
    """60-bit integer hash of a string: first 15 hex digits of md5.
    Reproducible in DuckDB as CAST('0x' || substr(md5(w),1,15) AS BIGINT)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def tokenize(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Distinct (id, word) pairs — the shingle table."""
    return (
        docs.select(id_col, F.explode(F.split(text_col, r"\s+")).alias("word"))
        .filter(F.col("word") != "")
        .distinct()
    )


def word_ngrams(
    docs: DataFrame, n: int, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Distinct (id, g) word n-grams — the shingle table for overlap-based
    operators (n-gram Jaccard, benchmark decontamination). Whole-stage
    codegen: one split + one transform/sequence explode; ``F.get`` (0-based,
    NULL-safe) instead of ``getItem`` per the ANSI-mode rule. Indices are
    bounded by the sequence upper end, so no NULL grams are produced."""
    ws = (
        docs.filter(F.trim(text_col) != "")
        .select(id_col, F.split(F.trim(text_col), r"\s+").alias("ws"))
        .filter(F.size("ws") >= n)
    )
    gram = F.explode(
        F.transform(
            F.sequence(F.lit(0), F.size("ws") - n),
            lambda i: F.concat_ws(" ", *[F.get("ws", i + k) for k in range(n)]),
        )
    )
    return ws.select(id_col, gram.alias("g")).distinct()


def contaminated_docs(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_benchmark: bool | str = True,
    broadcast_max_docs: int = 200_000,
) -> DataFrame:
    """Benchmark decontamination (the GPT-3/Pile eval-overlap rule): docs
    sharing >= 1 distinct word n-gram (default 13-gram) with any benchmark
    document, returned as (id, n_hit_grams).

    Scale shape: the benchmark side collapses to its DISTINCT gram set —
    eval suites are 10^5-10^6 grams, broadcastable next to a 10^10-doc
    training side, so the probe is a broadcast hash join with no shuffle of
    the big side. ``broadcast_benchmark`` controls the join strategy:

    - ``True``: always broadcast — only for callers that KNOW the probe
      side is an eval suite (small by construction);
    - ``False``: shuffle join on ``g`` — the correct shape when the probe
      side is itself a corpus split (trillions of distinct grams at 100 TB
      would OOM every executor through ``F.broadcast``);
    - ``"auto"``: gate on the benchmark's DOC count via a capped
      ``limit(max+1).count()`` scan (VERDICT r5 #1 — mirrors the engine's
      ``robots_broadcast_max_rows`` gate; counting docs is one cheap scan,
      whereas counting distinct grams would itself shuffle the gram set).
      An eval suite is 10^3-10^5 docs; a corpus split is orders beyond,
      so ``broadcast_max_docs`` separates the two regimes cleanly.

    The aggregation is a groupBy on the (already-distinct) hit grams per
    doc either way — both modes return identical rows (test-pinned)."""
    if broadcast_benchmark == "auto":
        n_bench = benchmark.limit(broadcast_max_docs + 1).count()
        broadcast_benchmark = n_bench <= broadcast_max_docs
    tg = word_ngrams(docs, n, id_col, text_col)
    bg = word_ngrams(benchmark, n, id_col, text_col).select("g").distinct()
    if broadcast_benchmark:
        bg = F.broadcast(bg)
    return (
        tg.join(bg, "g")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_hit_grams"))
    )


def minhash_signatures(words: DataFrame, n_perm: int = 32, id_col: str = "doc_id") -> DataFrame:
    """One row per doc: h0..h{P-1} minhash signature (P min-aggregates,
    one shuffle, one md5 per word)."""
    params = minhash_params(n_perm)
    r = F.pmod(word_hash_col(F.col("word")), F.lit(MINHASH_P))
    hashed = words.withColumn("_r", r)
    aggs = [
        F.min((F.lit(a) * F.col("_r") + F.lit(b)) % F.lit(MINHASH_P)).alias(f"h{i}")
        for i, (a, b) in enumerate(params)
    ]
    return hashed.groupBy(id_col).agg(*aggs)


def band_key_cols(n_perm: int, bands: int) -> list[F.Column]:
    """One string key per band: 'h_i,h_j,...' — the same textual encoding
    the SQL oracle uses (concat_ws matches || on both engines)."""
    rows_per_band = n_perm // bands
    out = []
    for b in range(bands):
        cols = [f"h{b * rows_per_band + i}" for i in range(rows_per_band)]
        out.append(F.concat_ws(",", *[F.col(c).cast("string") for c in cols]))
    return out


def lsh_candidate_pairs(
    sig: DataFrame, n_perm: int = 32, bands: int = 8, id_col: str = "doc_id"
) -> DataFrame:
    """(a_id, b_id) candidate pairs: equal signature slice in >=1 band.

    Band rows are exploded then self-equi-joined on (band, key) — at scale
    this is a shuffle join on the band key, never a cross join.
    """
    band_cols = [
        F.struct(F.lit(b).alias("band"), key.alias("key"))
        for b, key in enumerate(band_key_cols(n_perm, bands))
    ]
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
    broadcast_sig: bool | None = None,
) -> DataFrame:
    """Signature-based Jaccard estimate: fraction of agreeing minhashes.

    O(pairs x n_perm) — the verification step for LSH candidates at scale,
    where exact word-set intersection (O(pairs x |doc|)) melts down on
    near-dup-heavy corpora (every pair a spam cluster produces is a true
    candidate, so the exact join multiplies millions of pairs by document
    length).

    broadcast_sig=None (default) leaves the join strategy to Catalyst/AQE,
    which broadcasts iff the signature table's measured size is under the
    auto-broadcast threshold — size-aware instead of caller's-memory-aware.
    True/False force the hint on/off."""
    arr = F.array(*[f"h{i}" for i in range(n_perm)])
    sa = sig.select(F.col(id_col).alias("a_id"), arr.alias("siga"))
    sb = sig.select(F.col(id_col).alias("b_id"), arr.alias("sigb"))
    if broadcast_sig:
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


def simhash(words_counted: DataFrame, id_col: str = "doc_id", bits: int = SIMHASH_BITS) -> DataFrame:
    """SimHash per doc from (id, word, cnt) rows.

    Bit-majority as ``bits`` conditional-sum aggregates over the 60-bit
    md5 word hash — all codegen'd; the per-bit sums recombine into one
    positive BIGINT column (60 bits never touches the sign bit, so the
    same arithmetic is valid in DuckDB).
    """
    if bits > 62:
        # 1 << 63 overflows a signed long on BOTH engines (the old 64-bit
        # variant special-cased the sign bit; this scheme stays positive)
        raise ValueError(f"simhash supports at most 62 bits, got {bits}")
    if bits != SIMHASH_BITS:
        # simhash_near_pairs bands assume the module-wide width; signatures
        # built differently would be silently mis-banded downstream
        raise ValueError(
            f"bits={bits} differs from SIMHASH_BITS={SIMHASH_BITS}; "
            "change the module constant so banding stays consistent"
        )
    h = word_hash_col(F.col("word"))
    hashed = words_counted.withColumn("_h", h)
    aggs = [
        F.sum(
            F.when(F.shiftright("_h", i).bitwiseAND(F.lit(1)) == 1, F.col("cnt")).otherwise(
                -F.col("cnt")
            )
        ).alias(f"b{i}")
        for i in range(bits)
    ]
    per_bit = hashed.groupBy(id_col).agg(*aggs)
    sim = None
    for i in range(bits):
        term = F.when(F.col(f"b{i}") > 0, F.lit(1 << i).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        sim = term if sim is None else (sim + term)
    return per_bit.select(id_col, sim.alias("simhash"))


def simhash_near_pairs(
    sigs: DataFrame, max_hamming: int = 3, id_col: str = "doc_id"
) -> DataFrame:
    """Near-dup pairs by Hamming distance <= k, banded 4x15 bits.

    Pigeonhole: hamming<=3 over 4 bands guarantees one band matches
    exactly, so candidates come from an equi-join on (band, 15-bit slice).
    """
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
