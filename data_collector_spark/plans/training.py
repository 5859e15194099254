"""Training-data pipeline operators over documents/embeddings.

Dedup (exact, Jaccard, MinHash+LSH, SimHash), similarity search (brute
cosine + LSH/IVF ANN), text analytics, and multimodal metadata plumbing.

EVERY operator here carries a DuckDB oracle: the sketches hash with
md5-derived integers and the ANN paths decide signs/cells in quantized
integer arithmetic, so the oracle replays the exact same candidate sets
and scores — the oracle SQL strings are generated below from the same
splitmix64 constants the Spark plans embed (functions/detrand.py).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_collector_spark.functions.detrand import (
    MINHASH_P,
    minhash_params,
    plane_signs,
)
from data_collector_spark.functions.multimodal import extract_media_meta
from data_collector_spark.functions.similarity import (
    brute_force_topk,
    ivf_topk,
    lsh_topk,
)
from data_collector_spark.functions.sketches import (
    SIMHASH_BANDS,
    SIMHASH_BITS,
    exact_jaccard,
    lsh_near_pairs,
    minhash_signatures,
    raw_words,
    simhash,
    simhash_near_pairs,
    tokenize,
)
from data_collector_spark.functions.textstats import (
    bpe_ish_count_col,
    fingerprint_col,
    lang_id_col,
    quality_score_col,
    token_count_col,
)
from data_collector_spark.plans.registry import query
from data_collector_spark.sources.tables import load_table


# ---------------------------------------------------------------------------
# deduplication
# ---------------------------------------------------------------------------
@query(
    "dedup_exact",
    """
    SELECT min(doc_id) AS doc_id, count(*) AS n_dups
    FROM documents GROUP BY md5(text)
    """,
)
def dedup_exact(spark, sf):
    """Exact dedup by content hash, deterministic representative (min id)."""
    d = load_table(spark, sf, "documents")
    return (
        d.groupBy(F.md5("text").alias("_h"))
        .agg(F.min("doc_id").alias("doc_id"), F.count("*").alias("n_dups"))
        .drop("_h")
    )


@query(
    "dedup_jaccard_words",
    """
    WITH w AS (SELECT DISTINCT doc_id, w AS word FROM (
                 SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS w
                 FROM documents WHERE doc_id < 150) s WHERE w <> ''),
         sz AS (SELECT doc_id, count(*) AS n FROM w GROUP BY doc_id),
         inter AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS c
                   FROM w a JOIN w b ON a.word = b.word AND a.doc_id < b.doc_id
                   GROUP BY a.doc_id, b.doc_id)
    SELECT a_id, b_id, round(c * 1.0 / (sa.n + sb.n - c), 4) AS jaccard
    FROM inter
    JOIN sz sa ON sa.doc_id = a_id
    JOIN sz sb ON sb.doc_id = b_id
    WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.8
    """,
)
def dedup_jaccard_words(spark, sf):
    """Near-dup pairs by exact word-set Jaccard >= 0.8 (bounded slice —
    the exact baseline the sketches approximate)."""
    d = load_table(spark, sf, "documents").filter(F.col("doc_id") < 150)
    words = tokenize(d)
    pairs = (
        words.select(F.col("doc_id").alias("a_id"))
        .distinct()
        .join(words.select(F.col("doc_id").alias("b_id")).distinct())
        .filter(F.col("a_id") < F.col("b_id"))
    )
    j = exact_jaccard(words, pairs)
    return j.filter(F.col("jaccard") >= 0.8).select(
        "a_id", "b_id", F.round("jaccard", 4).alias("jaccard")
    )


# ---- generated oracle SQL for the sketch/ANN operators --------------------
# The constants (minhash (a,b) pairs, LSH plane signs) come from the same
# detrand splitmix64 stream the Spark plans use, so both engines replay the
# IDENTICAL sketch — these are full value oracles, not rows-only checks.

_WORD_R = f"CAST('0x' || substr(md5(word), 1, 15) AS BIGINT) % {MINHASH_P}"
_WORD_G = "CAST('0x' || substr(md5(word), 1, 15) AS BIGINT)"


def _minhash_oracle(n_perm: int = 32, bands: int = 8, thresh: float = 0.5) -> str:
    params = minhash_params(n_perm)
    mins = ",\n               ".join(
        f"min(({a} * r + {b}) % {MINHASH_P}) AS h{i}"
        for i, (a, b) in enumerate(params)
    )
    rpb = n_perm // bands
    band_rows = "\n       UNION ALL\n       ".join(
        "SELECT doc_id, {b} AS band, {key} AS key FROM sig".format(
            b=b,
            key=" || ',' || ".join(
                f"CAST(h{b * rpb + i} AS VARCHAR)" for i in range(rpb)
            ),
        )
        for b in range(bands)
    )
    agree = " + ".join(
        f"(CASE WHEN sa.h{i} = sb.h{i} THEN 1 ELSE 0 END)" for i in range(n_perm)
    )
    return f"""
    WITH w AS (SELECT DISTINCT doc_id, w AS word FROM (
                 SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS w
                 FROM documents) s WHERE w <> ''),
         h AS (SELECT doc_id, {_WORD_R} AS r FROM w),
         sig AS (SELECT doc_id,
               {mins}
             FROM h GROUP BY doc_id),
         banded AS (
       {band_rows}),
         cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
                  FROM banded a JOIN banded b
                    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
         est AS (SELECT a_id, b_id, ({agree}) / {float(n_perm)} AS je
                 FROM cand
                 JOIN sig sa ON sa.doc_id = a_id
                 JOIN sig sb ON sb.doc_id = b_id)
    SELECT a_id, b_id, round(je, 4) AS jaccard_est FROM est WHERE je >= {thresh}
    """


def _simhash_oracle(max_hamming: int = 3) -> str:
    bits, bands = SIMHASH_BITS, SIMHASH_BANDS
    width = bits // bands
    mask = (1 << width) - 1
    sums = ",\n              ".join(
        f"sum(CASE WHEN (g >> {i}) & 1 = 1 THEN cnt ELSE -cnt END) AS b{i}"
        for i in range(bits)
    )
    recombine = " + ".join(
        f"(CASE WHEN b{i} > 0 THEN {1 << i} ELSE 0 END)" for i in range(bits)
    )
    band_rows = "\n       UNION ALL\n       ".join(
        f"SELECT doc_id, simhash, {b} AS band, (simhash >> {b * width}) & {mask} AS key FROM sig"
        for b in range(bands)
    )
    return f"""
    WITH cnt AS (SELECT doc_id, w AS word, count(*) AS cnt FROM (
                   SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS w
                   FROM documents) s WHERE w <> '' GROUP BY doc_id, w),
         h AS (SELECT doc_id, cnt, {_WORD_G} AS g FROM cnt),
         pb AS (SELECT doc_id,
              {sums}
            FROM h GROUP BY doc_id),
         sig AS (SELECT doc_id, CAST({recombine} AS BIGINT) AS simhash FROM pb),
         banded AS (
       {band_rows}),
         cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
                         a.simhash AS sa, b.simhash AS sb
                  FROM banded a JOIN banded b
                    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id)
    SELECT a_id, b_id, CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
    FROM cand WHERE bit_count(xor(sa, sb)) <= {max_hamming}
    """


EMB_DIM = 64  # generator contract: every sf level emits 64-dim embeddings


def _lsh_ann_oracle(n_q: int = 5, k: int = 5, n_planes: int = 8) -> str:
    signs = plane_signs(n_planes, EMB_DIM)
    terms = []
    for p, srow in enumerate(signs):
        lit = "[" + ", ".join(str(s) for s in srow) + "]"
        dot = f"list_sum(list_transform(list_zip(qv, {lit}), z -> z[1] * z[2]))"
        terms.append(f"(CASE WHEN {dot} > 0 THEN {1 << p} ELSE 0 END)")
    bucket = " + ".join(terms)
    return f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         q AS (SELECT vec_id, v,
                      list_transform(v, x -> CAST(round(1000 * x) AS BIGINT)) AS qv
               FROM e),
         b AS (SELECT vec_id, v, {bucket} AS bucket FROM q),
         qs AS (SELECT vec_id AS q_id, v AS qe, bucket FROM b WHERE vec_id < {n_q}),
         cs AS (SELECT vec_id AS c_id, v AS ce, bucket FROM b),
         scored AS (SELECT q_id, c_id, list_cosine_similarity(qe, ce) AS s
                    FROM qs JOIN cs USING (bucket) WHERE q_id <> c_id)
    SELECT q_id, c_id, sim FROM (
      SELECT q_id, c_id, round(s, 4) AS sim,
             row_number() OVER (PARTITION BY q_id ORDER BY round(s, 4) DESC, c_id) AS rn
      FROM scored) t
    WHERE rn <= {k}
    """


def _ivf_ann_oracle(n_q: int = 5, k: int = 5, n_cells: int = 16, nprobe: int = 4) -> str:
    return f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         qq AS (SELECT vec_id, v,
                       list_transform(v, x -> CAST(round(1000 * x) AS BIGINT)) AS qv
                FROM e),
         cent AS (SELECT vec_id AS cell,
                         list_transform(CAST(embedding AS DOUBLE[]),
                                        x -> CAST(round(1000 * x) AS BIGINT)) AS cv
                  FROM embeddings WHERE vec_id < {n_cells}),
         dists AS (SELECT qq.vec_id, cent.cell,
                     list_sum(list_transform(list_zip(qv, cv),
                                             z -> (z[1] - z[2]) * (z[1] - z[2]))) AS d
                   FROM qq CROSS JOIN cent),
         ranked AS (SELECT vec_id, cell,
                           row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
                    FROM dists),
         cand_cells AS (SELECT vec_id AS c_id, cell FROM ranked WHERE rn = 1),
         query_cells AS (SELECT vec_id AS q_id, cell FROM ranked
                         WHERE rn <= {nprobe} AND vec_id < {n_q}),
         pairs AS (SELECT DISTINCT q_id, c_id
                   FROM query_cells JOIN cand_cells USING (cell) WHERE q_id <> c_id),
         sims AS (SELECT q_id, c_id, list_cosine_similarity(a.v, b.v) AS s
                  FROM pairs JOIN e a ON a.vec_id = q_id JOIN e b ON b.vec_id = c_id)
    SELECT q_id, c_id, sim FROM (
      SELECT q_id, c_id, round(s, 4) AS sim,
             row_number() OVER (PARTITION BY q_id ORDER BY round(s, 4) DESC, c_id) AS rn
      FROM sims) t
    WHERE rn <= {k}
    """


@query("dedup_minhash_lsh", _minhash_oracle())
def dedup_minhash_lsh(spark, sf):
    """MinHash(32)+LSH(8 bands) candidates verified by the signature
    Jaccard estimate >= 0.5.

    The scale path for dedup_jaccard_words: candidate generation is an
    equi-join on band keys (never all-pairs), and verification is
    O(pairs x 32) on the signatures — exact word-set verification would
    multiply every spam-cluster pair by document length. The md5-affine
    hash scheme is replayed verbatim by the DuckDB oracle.

    r7: candidate generation + dedup + verification run fused at
    DISTINCT-signature level (functions/sketches.lsh_near_pairs) — the
    doc-level band join went quadratic on the template-heavy bench corpus
    (2.35e9 candidate rows at 50k docs; 321-512 s measured) while the
    same corpus has only 24k distinct signatures. Result-identical to the
    lsh_candidate_pairs + estimated_jaccard composition (the oracle and
    tests/test_dedup.py pin it). The signature build reads raw word
    occurrences — min() is multiplicity-invariant, so tokenize()'s
    distinct would be a wasted full shuffle of the word table."""
    d = load_table(spark, sf, "documents")
    words = raw_words(d)
    sig = minhash_signatures(words, n_perm=32)
    j = lsh_near_pairs(sig, n_perm=32, bands=8, threshold=0.5)
    return j.select(
        "a_id", "b_id", F.round("jaccard_est", 4).alias("jaccard_est")
    )


@query("dedup_simhash", _simhash_oracle())
def dedup_simhash(spark, sf):
    """SimHash-60 near-dup pairs, Hamming <= 3, banded candidate join —
    oracle replays the same 60-bit md5 hash and band split.

    r7: the (doc, word) count groupBy is gone — the bit-majority sums are
    linear in cnt, so feeding each word OCCURRENCE with cnt=1 yields the
    identical integer sums with one less shuffle of the word table."""
    d = load_table(spark, sf, "documents")
    counted = raw_words(d).withColumn("cnt", F.lit(1))
    sigs = simhash(counted)
    return simhash_near_pairs(sigs, max_hamming=3).select(
        "a_id", "b_id", F.col("hamming").cast("long").alias("hamming")
    )


@query(
    "dedup_embedding_cosine",
    """
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings WHERE vec_id < 300)
    SELECT a.vec_id AS a_id, b.vec_id AS b_id,
           round(list_cosine_similarity(a.v, b.v), 4) AS cos_sim
    FROM e a JOIN e b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.v, b.v) >= 0.95
    """,
)
def dedup_embedding_cosine(spark, sf):
    """Embedding near-dup pairs: cosine >= 0.95 over a bounded slice
    (exact baseline; the LSH-bucketed path is ann_lsh_topk)."""
    from data_collector_spark.functions.similarity import _as_double, cosine_col

    e = load_table(spark, sf, "embeddings").filter(F.col("vec_id") < 300)
    a = e.select(F.col("vec_id").alias("a_id"), _as_double(F.col("embedding")).alias("va"))
    b = e.select(F.col("vec_id").alias("b_id"), _as_double(F.col("embedding")).alias("vb"))
    pairs = a.join(b, F.col("a_id") < F.col("b_id"))
    sim = cosine_col(F.col("va"), F.col("vb"))
    return (
        pairs.select("a_id", "b_id", sim.alias("_s"))
        .filter(F.col("_s") >= 0.95)
        .select("a_id", "b_id", F.round("_s", 4).alias("cos_sim"))
    )


@query(
    "dedup_ngram3_jaccard",
    """
    WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws
                  FROM documents WHERE doc_id < 100 AND trim(text) <> ''),
         grams AS (SELECT DISTINCT doc_id,
                          unnest(list_transform(
                              generate_series(1, len(ws) - 2),
                              i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS g
                   FROM toks WHERE len(ws) >= 3),
         sz AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id),
         inter AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS c
                   FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
                   GROUP BY 1, 2)
    SELECT a_id, b_id, round(c * 1.0 / (sa.n + sb.n - c), 4) AS jaccard3
    FROM inter JOIN sz sa ON sa.doc_id = a_id JOIN sz sb ON sb.doc_id = b_id
    WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.5
    """,
)
def dedup_ngram3_jaccard(spark, sf):
    """Word-3-gram shingle Jaccard >= 0.5 (bounded slice) — shingles built
    with transform/sequence higher-order functions, JVM-side."""
    d = (
        load_table(spark, sf, "documents")
        .filter((F.col("doc_id") < 100) & (F.trim("text") != ""))
        .select("doc_id", F.split(F.trim("text"), r"\s+").alias("ws"))
        .filter(F.size("ws") >= 3)
    )
    grams = d.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("ws") - 3),
                lambda i: F.concat_ws(
                    " ",
                    F.get("ws", i),
                    F.get("ws", i + 1),
                    F.get("ws", i + 2),
                ),
            )
        ).alias("g"),
    ).distinct()
    sizes = grams.groupBy("doc_id").agg(F.count("*").alias("n"))
    ga = grams.select(F.col("doc_id").alias("a_id"), "g")
    gb = grams.select(F.col("doc_id").alias("b_id"), "g")
    inter = (
        ga.join(gb, "g")
        .filter(F.col("a_id") < F.col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(F.count("*").alias("c"))
    )
    j = (
        inter.join(sizes.select(F.col("doc_id").alias("a_id"), F.col("n").alias("na")), "a_id")
        .join(sizes.select(F.col("doc_id").alias("b_id"), F.col("n").alias("nb")), "b_id")
        .select(
            "a_id", "b_id",
            (F.col("c") / (F.col("na") + F.col("nb") - F.col("c"))).alias("_j"),
        )
    )
    return j.filter(F.col("_j") >= 0.5).select(
        "a_id", "b_id", F.round("_j", 4).alias("jaccard3")
    )


def _ngram_sql_concat(n: int) -> str:
    """DuckDB fragment building the word n-gram from a 1-based list slice."""
    return " || ' ' || ".join(f"ws[i+{k}]" for k in range(n))


# benchmark slice for the in-sandbox decontamination queries: a
# deterministic ~7.7% of the documents table stands in for the held-out
# eval suite (no external data allowed here); both engines compute it
# from doc_id so the oracle replays membership exactly
_DECONTAM_MOD, _DECONTAM_RES, _DECONTAM_N = 13, 7, 13

# shared CTE blocks (no leading WITH) so the standalone queries and the
# composed pipeline oracle replay the identical gram/slice construction
_NGRAM_CTES = rf"""
    toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws
             FROM documents WHERE trim(text) <> ''),
    grams AS (SELECT DISTINCT doc_id,
                     unnest(list_transform(
                         generate_series(1, len(ws) - {_DECONTAM_N - 1}),
                         i -> {_ngram_sql_concat(_DECONTAM_N)})) AS g
              FROM toks WHERE len(ws) >= {_DECONTAM_N})
"""

_DECONTAM_CTES = _NGRAM_CTES + rf""",
    bg AS (SELECT DISTINCT g FROM grams
           WHERE doc_id % {_DECONTAM_MOD} = {_DECONTAM_RES})
"""


@query(
    "decontaminate",
    rf"""
    WITH {_DECONTAM_CTES}
    SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_hit_grams
    FROM grams g JOIN bg USING (g)
    WHERE g.doc_id % {_DECONTAM_MOD} <> {_DECONTAM_RES}
    GROUP BY 1
    """,
)
def decontaminate(spark, sf):
    """Benchmark decontamination: training docs sharing >= 1 distinct
    word-13-gram with the (deterministic, in-corpus) benchmark slice —
    the GPT-3/Pile eval-overlap rule as a broadcast-gram probe. The
    oracle replays the gram construction, slice membership, and hit
    counts exactly."""
    from data_collector_spark.functions.sketches import contaminated_docs

    d = load_table(spark, sf, "documents")
    bench = d.filter(F.col("doc_id") % _DECONTAM_MOD == _DECONTAM_RES)
    train = d.filter(F.col("doc_id") % _DECONTAM_MOD != _DECONTAM_RES)
    return contaminated_docs(train, bench, n=_DECONTAM_N).select(
        "doc_id", F.col("n_hit_grams").cast("long").alias("n_hit_grams")
    )


# ---------------------------------------------------------------------------
# similarity search
# ---------------------------------------------------------------------------
@query(
    "ann_cosine_topk",
    """
    WITH q AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qe
               FROM embeddings WHERE vec_id < 5),
         c AS (SELECT vec_id AS c_id, CAST(embedding AS DOUBLE[]) AS ce
               FROM embeddings)
    SELECT q_id, c_id, sim FROM (
      SELECT q_id, c_id, round(list_cosine_similarity(qe, ce), 4) AS sim,
             row_number() OVER (PARTITION BY q_id
                                ORDER BY round(list_cosine_similarity(qe, ce), 4) DESC,
                                         c_id) AS rn
      FROM q CROSS JOIN c WHERE q_id <> c_id) t
    WHERE rn <= 5
    """,
)
def ann_cosine_topk(spark, sf):
    """Brute-force cosine top-5 per query vector — built-in higher-order
    functions only (zip_with/aggregate), broadcast query side."""
    e = load_table(spark, sf, "embeddings")
    return brute_force_topk(e.filter(F.col("vec_id") < 5), e, k=5)


@query("ann_lsh_topk", _lsh_ann_oracle())
def ann_lsh_topk(spark, sf):
    """LSH-bucketed ANN top-5: same-bucket candidates, exact re-rank.
    Sign decisions are quantized-integer dot products, so the oracle
    reproduces the exact buckets (dim pinned by the generator contract)."""
    e = load_table(spark, sf, "embeddings")
    return lsh_topk(e.filter(F.col("vec_id") < 5), e, dim=EMB_DIM, k=5, n_planes=8)


@query("ann_ivf_topk", _ivf_ann_oracle())
def ann_ivf_topk(spark, sf):
    """IVF ANN top-5: inverted-list cells + nprobe probing, exact re-rank.
    Cell assignment is quantized-integer L2 against the first n_cells
    vectors (a filter, not a sort) — reproduced exactly by the oracle."""
    e = load_table(spark, sf, "embeddings")
    return ivf_topk(e.filter(F.col("vec_id") < 5), e, k=5, n_cells=16, nprobe=4)


# ---------------------------------------------------------------------------
# text analytics
# ---------------------------------------------------------------------------
@query(
    "text_lang_id",
    r"""
    SELECT doc_id,
           CASE WHEN en >= de AND en >= fr AND en > 0 THEN 'en'
                WHEN de >= fr AND de > 0 THEN 'de'
                WHEN fr > 0 THEN 'fr'
                ELSE 'und' END AS lang_pred
    FROM (SELECT doc_id,
                 len(regexp_extract_all(text, '\b(the|a|of|and)\b')) AS en,
                 len(regexp_extract_all(text, '\b(der|und|die|das)\b')) AS de,
                 len(regexp_extract_all(text, '\b(le|et|la|les)\b')) AS fr
          FROM documents) s
    """,
)
def text_lang_id(spark, sf):
    """Marker-word language-ID heuristic (deterministic argmax)."""
    d = load_table(spark, sf, "documents")
    return d.select("doc_id", lang_id_col(F.col("text")).alias("lang_pred"))


@query(
    "text_quality_score",
    r"""
    SELECT doc_id,
           round(0.5 * least(1.0, n_tokens / 50.0)
                 + 0.5 * least(1.0, 4.0 * CASE WHEN n_tokens > 0
                                               THEN stop / n_tokens
                                               ELSE 0.0 END), 4) AS quality
    FROM (SELECT doc_id,
                 CASE WHEN trim(text) = '' THEN 0
                      ELSE len(string_split_regex(trim(text), '\s+')) END * 1.0 AS n_tokens,
                 len(regexp_extract_all(text, '\b(the|a|of|and|to|in)\b')) * 1.0 AS stop
          FROM documents) s
    """,
)
def text_quality_score(spark, sf):
    """Length-saturation + stopword-ratio quality heuristic in [0,1]."""
    d = load_table(spark, sf, "documents")
    return d.select("doc_id", quality_score_col(F.col("text")).alias("quality"))


@query(
    "text_token_counts",
    r"""
    SELECT doc_id,
           CAST(CASE WHEN trim(text) = '' THEN 0
                     ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT) AS n_ws_tokens,
           CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_bpe_ish
    FROM documents
    """,
)
def text_token_counts(spark, sf):
    """Whitespace + BPE-ish token counting."""
    d = load_table(spark, sf, "documents")
    return d.select(
        "doc_id",
        token_count_col(F.col("text")).alias("n_ws_tokens"),
        bpe_ish_count_col(F.col("text")).alias("n_bpe_ish"),
    )


@query(
    "text_fingerprint",
    r"""
    SELECT doc_id,
           md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp
    FROM documents
    """,
)
def text_fingerprint(spark, sf):
    """Whitespace-normalized content fingerprint (md5)."""
    d = load_table(spark, sf, "documents")
    return d.select("doc_id", fingerprint_col(F.col("text")).alias("fp"))


# shared PII CTE block (no leading WITH): the synthesized PII-bearing
# contact string + the three-stage replacement chain, reused verbatim by
# the standalone pii_redaction row and the composed pipeline oracle
_PII_CTES = r"""
    psynth AS (
      SELECT doc_id,
             'contact user' || CAST(doc_id AS VARCHAR) || '@mail'
               || CAST(doc_id % 7 AS VARCHAR) || '.example.org or 10.'
               || CAST(doc_id % 256 AS VARCHAR) || '.'
               || CAST((doc_id * 3) % 256 AS VARCHAR) || '.7 call +1 55500'
               || CAST(doc_id AS VARCHAR) || ' end ' || substr(text, 1, 40) AS s
      FROM documents
    ),
    pr1 AS (SELECT doc_id, s,
                  len(regexp_extract_all(s, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS c1,
                  regexp_replace(s, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS s1
           FROM psynth),
    pr2 AS (SELECT doc_id, c1,
                  len(regexp_extract_all(s1, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS c2,
                  regexp_replace(s1, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS s2
           FROM pr1),
    pii AS (SELECT doc_id, c1, c2,
                  len(regexp_extract_all(s2, '\+\d[\d ]{7,}\d\b')) AS c3,
                  regexp_replace(s2, '\+\d[\d ]{7,}\d\b', '<PHONE>', 'g') AS s3
           FROM pr2)
"""


def _pii_synth_col():
    """Deterministic PII-bearing contact string from doc_id + a text slice
    (the corpus text carries no PII, so the redaction chain would be an
    identity on it — the same synthesis trick multimodal_meta uses keeps
    the chain discriminating under the driver gate)."""
    i = F.col("doc_id")
    return F.concat(
        F.lit("contact user"), i.cast("string"),
        F.lit("@mail"), (i % 7).cast("string"),
        F.lit(".example.org or 10."), (i % 256).cast("string"),
        F.lit("."), ((i * 3) % 256).cast("string"),
        F.lit(".7 call +1 55500"), i.cast("string"),
        F.lit(" end "), F.substring("text", 1, 40),
    )


@query(
    "pii_redaction",
    rf"""
    WITH {_PII_CTES}
    SELECT doc_id, s3 AS redacted, CAST(c1 + c2 + c3 AS BIGINT) AS n_pii
    FROM pii
    """,
)
def pii_redaction(spark, sf):
    """C4/Dolma-style PII scrub (emails, IPv4, + international phone runs
    to typed placeholders) over the synthesized contact string
    (_pii_synth_col) — the oracle replays the construction, the
    replacement chain, and the per-class hit counts, so a regex divergence
    between engines hash-mismatches."""
    from data_collector_spark.functions.textstats import (
        pii_hit_count_col,
        redact_pii_col,
    )

    d = load_table(spark, sf, "documents")
    synth = _pii_synth_col()
    return d.select(
        "doc_id",
        redact_pii_col(synth).alias("redacted"),
        pii_hit_count_col(synth).alias("n_pii"),
    )


# shared repetition CTE block (no leading WITH; r-prefixed names so it
# composes next to _NGRAM_CTES' toks): the Gopher word-level stats,
# reused verbatim by the standalone row and the composed pipeline oracle
_REP_CTES = r"""
    rtoks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws
              FROM documents WHERE trim(text) <> ''),
    rwords AS (SELECT doc_id, unnest(ws) AS w FROM rtoks),
    rwstats AS (SELECT doc_id, count(*) AS n, count(DISTINCT w) AS nd
                FROM rwords GROUP BY 1),
    rg AS (SELECT doc_id,
                  unnest(list_transform(generate_series(1, len(ws) - 1),
                                        i -> ws[i] || ' ' || ws[i+1])) AS g2
           FROM rtoks WHERE len(ws) >= 2),
    rgc AS (SELECT doc_id, g2, count(*) AS c FROM rg GROUP BY 1, 2),
    rgs AS (SELECT doc_id, max(c) AS top, sum(c) AS tot FROM rgc GROUP BY 1),
    rep AS (SELECT w.doc_id,
                   round(1 - nd * 1.0 / n, 4) AS dup_word_frac,
                   round(coalesce(top * 1.0 / tot, 0), 4) AS top_2gram_frac
            FROM rwstats w LEFT JOIN rgs USING (doc_id))
"""


@query(
    "text_repetition_stats",
    rf"""
    WITH {_REP_CTES}
    SELECT doc_id, dup_word_frac, top_2gram_frac FROM rep
    """,
)
def text_repetition_stats(spark, sf):
    """Gopher/MassiveText repetition filters, word-level (duplicate-word
    fraction + most-frequent-2-gram fraction) — the boilerplate/spam
    signals a web-scale quality pass computes next to the stopword
    heuristics. Exploded-aggregation plan, oracle replays both fractions."""
    from data_collector_spark.functions.textstats import repetition_stats

    d = load_table(spark, sf, "documents")
    return repetition_stats(d)


@query(
    "text_stats_suite",
    r"""
    SELECT doc_id,
           CASE WHEN en >= de AND en >= fr AND en > 0 THEN 'en'
                WHEN de >= fr AND de > 0 THEN 'de'
                WHEN fr > 0 THEN 'fr'
                ELSE 'und' END AS lang_pred,
           round(0.5 * least(1.0, n_tokens / 50.0)
                 + 0.5 * least(1.0, 4.0 * CASE WHEN n_tokens > 0
                                               THEN stop / n_tokens
                                               ELSE 0.0 END), 4) AS quality,
           CAST(n_tokens AS BIGINT) AS n_ws_tokens,
           CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_bpe_ish,
           md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp,
           sha256(text) AS text_sha
    FROM (SELECT doc_id, text,
                 len(regexp_extract_all(text, '\b(the|a|of|and)\b')) AS en,
                 len(regexp_extract_all(text, '\b(der|und|die|das)\b')) AS de,
                 len(regexp_extract_all(text, '\b(le|et|la|les)\b')) AS fr,
                 CASE WHEN trim(text) = '' THEN 0
                      ELSE len(string_split_regex(trim(text), '\s+')) END * 1.0 AS n_tokens,
                 len(regexp_extract_all(text, '\b(the|a|of|and|to|in)\b')) * 1.0 AS stop
          FROM documents) s
    """,
)
def text_stats_suite(spark, sf):
    """The full per-document text-analysis pass in ONE scan — lang-ID,
    quality, token counts, fingerprint (the four queries above) plus the
    F16 content hash — the shape a 100 TB corpus pass actually runs (every
    column fused into a single codegen projection, one scan not five).
    One composed driver CORRECTNESS row covers all five operators."""
    d = load_table(spark, sf, "documents")
    t = F.col("text")
    return d.select(
        "doc_id",
        lang_id_col(t).alias("lang_pred"),
        quality_score_col(t).alias("quality"),
        token_count_col(t).alias("n_ws_tokens"),
        bpe_ish_count_col(t).alias("n_bpe_ish"),
        fingerprint_col(t).alias("fp"),
        F.sha2("text", 256).alias("text_sha"),
    )


# ---------------------------------------------------------------------------
# multimodal plumbing
# ---------------------------------------------------------------------------
@query(
    "multimodal_meta",
    """
    SELECT doc_id,
           CAST(CASE doc_id % 6 WHEN 0 THEN 33 WHEN 1 THEN 23 WHEN 2 THEN 14
                WHEN 3 THEN 44 WHEN 4 THEN 132
                ELSE octet_length(encode(text)) + 1 END AS BIGINT) AS n_bytes,
           CAST(CASE WHEN doc_id % 6 IN (0, 1, 2) THEN doc_id % 509 + 1
                WHEN doc_id % 6 IN (3, 4) THEN NULL
                ELSE (octet_length(encode(text)) + 1) % 640 END AS BIGINT) AS width,
           CAST(CASE WHEN doc_id % 6 IN (0, 1, 2) THEN doc_id % 389 + 1
                WHEN doc_id % 6 IN (3, 4) THEN NULL
                ELSE (octet_length(encode(text)) + 1) % 480 END AS BIGINT) AS height,
           CASE doc_id % 6 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' WHEN 2 THEN 'gif'
                WHEN 3 THEN 'wav' WHEN 4 THEN 'mp4' ELSE 'image' END AS kind,
           CAST(CASE doc_id % 6
                WHEN 3 THEN ((doc_id % 100000) + 1000) * 1000
                            // (16000 * (doc_id % 5 + 1))
                WHEN 4 THEN ((doc_id % 90000) + 1) * 1000 // (600 + doc_id % 1000)
                ELSE NULL END AS BIGINT) AS duration_ms
    FROM documents
    """,
)
def multimodal_meta(spark, sf):
    """Binary-column metadata extraction through the real mapInPandas
    plumbing. Five of six residue classes carry SYNTHESIZED real containers
    built from pure JVM expressions with fields derived from doc_id — PNG /
    JPEG / GIF images (dimensions), WAV audio (byte rate + data size) and
    MP4 video (mvhd timescale + duration), r6 closing the audio/video
    fallback gap — that the pure-Python header parsers
    (functions/multimodal.decode_media) must decode back. The sixth class
    carries raw text bytes PREFIXED WITH 0x00 so no printable-ASCII magic
    (GIF87a/RIFF/ftyp) can ever sniff as a container (ADVICE r5), taking
    the deterministic fallback. The oracle recomputes every field
    arithmetically — a parser that misreads any header field
    hash-mismatches."""
    d = load_table(spark, sf, "documents")

    def be(col, nbytes):  # fixed-width big-endian bytes of a non-negative int
        return F.unhex(F.lpad(F.hex(col), 2 * nbytes, "0"))

    def le(col, nbytes):  # little-endian: byte k = (col >> 8k) & 0xff
        return F.unhex(
            F.concat(
                *[
                    F.lpad(
                        F.hex((col / F.lit(256**k)).cast("bigint") % 256), 2, "0"
                    )
                    for k in range(nbytes)
                ]
            )
        )

    i = F.col("doc_id")
    w = (i % 509 + 1).cast("bigint")
    h = (i % 389 + 1).cast("bigint")
    png = F.concat(  # sig + IHDR len/tag + dims + bit-depth/color + CRC = 33 B
        F.lit(b"\x89PNG\r\n\x1a\n\x00\x00\x00\x0dIHDR"),
        be(w, 4), be(h, 4),
        F.lit(b"\x08\x02\x00\x00\x00\x00\x00\x00\x00"),
    )
    jpeg = F.concat(  # SOI + APP0(skipped by the walker) + SOF0 + EOI = 23 B
        F.lit(b"\xff\xd8\xff\xe0\x00\x04JF\xff\xc0\x00\x0b\x08"),
        be(h, 2), be(w, 2),
        F.lit(b"\x01\x01\x11\x00\xff\xd9"),
    )
    gif = F.concat(  # header + LE16 logical-screen dims + trailer = 14 B
        F.lit(b"GIF89a"), le(w, 2), le(h, 2), F.lit(b"\x00\x00\x00\x3b")
    )
    # WAV: RIFF/WAVE with a 16-byte fmt chunk (PCM mono 16-bit) and a
    # header-only data chunk (declared size, no sample bytes) = 44 B
    sample_rate = (8000 * (i % 5 + 1)).cast("bigint")
    byte_rate = (sample_rate * 2).cast("bigint")  # mono 16-bit: block align 2
    data_size = ((i % 100000) + 1000).cast("bigint")
    wav = F.concat(
        F.lit(b"RIFF"), le(data_size + 36, 4),
        F.lit(b"WAVEfmt \x10\x00\x00\x00\x01\x00\x01\x00"),
        le(sample_rate, 4), le(byte_rate, 4),
        F.lit(b"\x02\x00\x10\x00data"), le(data_size, 4),
    )
    # MP4: ftyp(16) + moov(8) wrapping a full 108-byte version-0 mvhd —
    # timescale/duration at body offsets 12/16, zero padding after = 132 B
    timescale = (600 + i % 1000).cast("bigint")
    dur_units = ((i % 90000) + 1).cast("bigint")
    mp4 = F.concat(
        F.lit(b"\x00\x00\x00\x10ftypisom\x00\x00\x00\x00"),
        F.lit(b"\x00\x00\x00\x74moov\x00\x00\x00\x6cmvhd"),
        F.lit(b"\x00" * 12),  # version/flags + ctime + mtime
        be(timescale, 4), be(dur_units, 4),
        F.lit(b"\x00" * 80),  # rate/volume/reserved/matrix/predef/next_track
    )
    payload = (
        F.when(i % 6 == 0, png)
        .when(i % 6 == 1, jpeg)
        .when(i % 6 == 2, gif)
        .when(i % 6 == 3, wav)
        .when(i % 6 == 4, mp4)
        .otherwise(F.concat(F.lit(b"\x00"), F.encode("text", "UTF-8")))
    )
    return extract_media_meta(d.select("doc_id", payload.alias("payload")))


@query(
    "embedding_norm_stats",
    """
    SELECT label,
           count(*) AS n,
           round(avg(round(sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
                                                        x -> x * x))), 6)), 3) AS avg_norm
    FROM embeddings GROUP BY label
    """,
)
def embedding_norm_stats(spark, sf):
    """Per-label vector L2-norm stats — array higher-order functions."""
    e = load_table(spark, sf, "embeddings")
    norm = F.sqrt(
        F.aggregate(
            F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    return (
        e.select("label", F.round(norm, 6).alias("_n"))
        .groupBy("label")
        .agg(F.count("*").alias("n"), F.round(F.avg("_n"), 3).alias("avg_norm"))
    )


# Gopher repetition caps for the composed pipeline — picked against the
# generator corpus' measured distribution (sf0.01: dup_word_frac p50 0.54
# / p80 0.65 / p99 0.71; top_2gram_frac p50 0.033 / p95 0.087) so BOTH
# caps actually discriminate: ~20% of docs exceed the dup cap, ~5% the
# 2-gram cap — the oracle verifies real membership decisions, not no-ops
_REP_DUP_CAP, _REP_TOP2_CAP = 0.65, 0.09


@query(
    "training_filter_pipeline",
    rf"""
    WITH {_DECONTAM_CTES},
    contam AS (
      SELECT DISTINCT g.doc_id FROM grams g JOIN bg USING (g)
      WHERE g.doc_id % {_DECONTAM_MOD} <> {_DECONTAM_RES}
    ),
    kept_ids AS (
      SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)
    ),
    feats AS (
      SELECT doc_id,
             CASE WHEN trim(text) = '' THEN 0
                  ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tok,
             round(0.5 * least(1.0, (CASE WHEN trim(text) = '' THEN 0
                        ELSE len(string_split_regex(trim(text), '\s+')) END) / 50.0)
                   + 0.5 * least(1.0, 4.0 * CASE WHEN trim(text) <> ''
                        THEN len(regexp_extract_all(text, '\b(the|a|of|and|to|in)\b')) * 1.0
                             / len(string_split_regex(trim(text), '\s+'))
                        ELSE 0.0 END), 4) AS quality,
             CASE WHEN en >= de AND en >= fr AND en > 0 THEN 'en'
                  WHEN de >= fr AND de > 0 THEN 'de'
                  WHEN fr > 0 THEN 'fr' ELSE 'und' END AS lang_pred
      FROM (SELECT doc_id, text,
                   len(regexp_extract_all(text, '\b(the|a|of|and)\b')) AS en,
                   len(regexp_extract_all(text, '\b(der|und|die|das)\b')) AS de,
                   len(regexp_extract_all(text, '\b(le|et|la|les)\b')) AS fr
            FROM documents) s
    ),
    {_REP_CTES},
    {_PII_CTES}
    SELECT f.doc_id, f.lang_pred, f.quality, CAST(f.n_tok AS BIGINT) AS n_tok,
           r.dup_word_frac, r.top_2gram_frac,
           md5(p.s3) AS redacted_fp, CAST(p.c1 + p.c2 + p.c3 AS BIGINT) AS n_pii
    FROM feats f
    JOIN kept_ids k ON k.doc_id = f.doc_id
    JOIN rep r ON r.doc_id = f.doc_id
    JOIN pii p ON p.doc_id = f.doc_id
    WHERE f.lang_pred = 'en' AND f.quality >= 0.5 AND f.n_tok BETWEEN 5 AND 100000
      AND r.dup_word_frac <= {_REP_DUP_CAP} AND r.top_2gram_frac <= {_REP_TOP2_CAP}
      AND f.doc_id % {_DECONTAM_MOD} <> {_DECONTAM_RES}
      AND f.doc_id NOT IN (SELECT doc_id FROM contam)
    """,
)
def training_filter_pipeline(spark, sf):
    """The composed end-product: exact-dedup survivors filtered to
    predicted-English, quality >= 0.5, sane token counts, under the Gopher
    repetition caps (dup-word / top-2-gram fractions — r6, folding
    text_repetition_stats under the driver gate; cap decisions compare the
    ROUNDED fractions on both engines per the oracle float discipline),
    then DECONTAMINATED — the benchmark slice itself is excluded and so is
    any doc sharing a distinct 13-gram with it (the GPT-3/Pile
    eval-overlap rule) — with the survivors' contact field PII-REDACTED
    (r6, folding the redaction chain under the driver gate: emitted as the
    redacted-string fingerprint + per-doc hit count over the synthesized
    PII-bearing contact column, _pii_synth_col) — the selection a web-text
    training pipeline actually ships.

    Plan shape: the dedup groupBy and the feature/PII expressions fuse
    under codegen; the survivor and stats joins broadcast (bounded: one id
    per duplicate group / one stats row per doc); the contamination probe
    is a broadcast of the benchmark's distinct gram set followed by a
    left-anti join; repetition stats are two exploded aggregations —
    everything JVM-side, zero Python."""
    from data_collector_spark.functions.sketches import contaminated_docs
    from data_collector_spark.functions.textstats import (
        pii_hit_count_col,
        redact_pii_col,
        repetition_stats,
    )

    d = load_table(spark, sf, "documents")
    kept = (
        d.groupBy(F.md5("text").alias("_h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    synth = _pii_synth_col()
    feats = d.select(
        "doc_id",
        lang_id_col(F.col("text")).alias("lang_pred"),
        quality_score_col(F.col("text")).alias("quality"),
        token_count_col(F.col("text")).alias("n_tok"),
        F.md5(redact_pii_col(synth)).alias("redacted_fp"),
        pii_hit_count_col(synth).alias("n_pii"),
    )
    rep = repetition_stats(d)
    bench = d.filter(F.col("doc_id") % _DECONTAM_MOD == _DECONTAM_RES)
    train = d.filter(F.col("doc_id") % _DECONTAM_MOD != _DECONTAM_RES)
    contam = contaminated_docs(train, bench, n=_DECONTAM_N).select("doc_id")
    return (
        feats.join(kept, "doc_id")
        .join(rep, "doc_id")
        .filter(
            (F.col("lang_pred") == "en")
            & (F.col("quality") >= 0.5)
            & F.col("n_tok").between(5, 100000)
            & (F.col("dup_word_frac") <= _REP_DUP_CAP)
            & (F.col("top_2gram_frac") <= _REP_TOP2_CAP)
            & (F.col("doc_id") % _DECONTAM_MOD != _DECONTAM_RES)
        )
        .join(contam, "doc_id", "left_anti")
        .select(
            "doc_id", "lang_pred", "quality", "n_tok",
            "dup_word_frac", "top_2gram_frac", "redacted_fp", "n_pii",
        )
    )


@query(
    "training_split",
    """
    SELECT doc_id,
           CASE WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
                     % 100 < 90
                THEN 'train' ELSE 'val' END AS split
    FROM documents
    """,
)
def training_split(spark, sf):
    """Deterministic 90/10 train/val split by id hash — membership is a
    pure function of the key (stable under reshuffles, appends, and
    re-partitioning; never sample()-based, which is partition-dependent).
    Same md5 bucket arithmetic as the sketches, so the oracle replays it
    exactly."""
    from data_collector_spark.functions.sketches import word_hash_col

    d = load_table(spark, sf, "documents")
    h = word_hash_col(F.col("doc_id").cast("string"))
    return d.select(
        "doc_id",
        F.when(h % 100 < 90, "train").otherwise("val").alias("split"),
    )


# shared weights CTE (no leading WITH): per-source mixing weight in integer
# parts-per-million, synthesized from the source-name hash so both engines
# derive identical weights with no fixture file — 0.25x..2.5x in 0.25 steps
# (downsampling, exact-integer, and fractional-upsample regimes all occur
# on the test corpus' 20 sources).
_MIX_W_CTE = """
    mixw AS (SELECT source,
                    250000 + (CAST('0x' || substr(md5(source), 1, 15) AS BIGINT) % 10)
                             * 250000 AS weight_ppm
             FROM (SELECT DISTINCT source FROM documents))
"""

# copy count under a ppm weight: floor guaranteed copies + one more when
# the doc's salted id hash lands under the fractional part (integer
# threshold — the md5-affine cross-engine discipline).
_MIX_N_SQL = """
    mixw.weight_ppm // 1000000
    + CASE WHEN CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || ':mix'), 1, 15) AS BIGINT)
                % 1000000 < mixw.weight_ppm % 1000000
           THEN 1 ELSE 0 END
"""


def _synth_mix_weights(d):
    """(source, weight_ppm) synthesized from the source-name hash —
    mirrors _MIX_W_CTE exactly."""
    from data_collector_spark.functions.sketches import word_hash_col

    return (
        d.select("source").distinct()
        .select(
            "source",
            (F.lit(250_000) + (word_hash_col(F.col("source")) % 10)
             * F.lit(250_000)).cast("long").alias("weight_ppm"),
        )
    )


@query(
    "source_mixing",
    rf"""
    WITH {_MIX_W_CTE}
    SELECT d.doc_id, d.source,
           CAST(unnest(generate_series(0, ({_MIX_N_SQL}) - 1)) AS BIGINT) AS copy
    FROM documents d JOIN mixw USING (source)
    """,
)
def source_mixing(spark, sf):
    """Pile/Gopher/Dolma-style source mixing: per-source weights as
    sampling rates (<1) and upsampling repeat factors (>1), applied as a
    pure function of the doc id — floor(w) guaranteed copies plus one
    more when the salted id hash lands under frac(w), carried as integer
    ppm so no float threshold crosses the engine boundary. Weights table
    is dimension-sized (one row per source family) and broadcast; the
    document side is never shuffled. Reference: no mixing step exists in
    the reference (it collects rather than composes training sets) — this
    extends the training-data family like decontamination/packing did."""
    from data_collector_spark.functions.mixing import mix_sources

    d = load_table(spark, sf, "documents")
    return mix_sources(d, _synth_mix_weights(d))


@query(
    "mixing_split_suite",
    rf"""
    WITH split AS (SELECT doc_id, source,
                          CASE WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
                                    % 100 < 90
                               THEN 'train' ELSE 'val' END AS split
                   FROM documents),
    {_MIX_W_CTE},
    tn AS (SELECT d.doc_id, d.source, d.split,
                  {_MIX_N_SQL} AS n_copies
           FROM split d JOIN mixw USING (source)
           WHERE d.split = 'train')
    SELECT doc_id, source, split,
           CAST(unnest(generate_series(0, n_copies - 1)) AS BIGINT) AS copy
    FROM tn
    UNION ALL
    SELECT doc_id, source, split, CAST(0 AS BIGINT) AS copy
    FROM split WHERE split = 'val'
    """,
)
def mixing_split_suite(spark, sf):
    """Composed split + mixing driver row (r6): the deterministic 90/10
    hash split (training_split's semantics, now driver-checked through
    this suite) with the train side re-weighted by the per-source mixing
    weights — val is never resampled or upsampled (eval distributions
    stay untouched), which is the shape a real pretraining pipeline
    ships. One row per (doc, copy); val docs carry copy=0."""
    from data_collector_spark.functions.mixing import mix_sources
    from data_collector_spark.functions.sketches import word_hash_col

    d = load_table(spark, sf, "documents")
    h = word_hash_col(F.col("doc_id").cast("string"))
    d = d.withColumn(
        "split", F.when(h % 100 < 90, "train").otherwise("val")
    )
    train = d.filter(F.col("split") == "train")
    val = d.filter(F.col("split") == "val")
    mixed = mix_sources(
        train.select("doc_id", "source"), _synth_mix_weights(d)
    )
    # mix_sources emits (id, source, copy); the train branch's split is
    # 'train' by construction, so re-attach it as a literal
    return (
        mixed.select(
            "doc_id", "source", F.lit("train").alias("split"), "copy"
        )
        .unionByName(
            val.select(
                "doc_id", "source", "split",
                F.lit(0).cast("long").alias("copy"),
            )
        )
    )


@query(
    "split_leakage_audit",
    rf"""
    WITH {_NGRAM_CTES},
    split AS (SELECT doc_id,
                     CASE WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
                               % 100 < 90
                          THEN 'train' ELSE 'val' END AS split
              FROM documents),
    tg AS (SELECT DISTINCT g FROM grams JOIN split USING (doc_id)
           WHERE split = 'train')
    SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_leaked_grams
    FROM grams g JOIN split s USING (doc_id) JOIN tg USING (g)
    WHERE s.split = 'val'
    GROUP BY 1
    """,
)
def split_leakage_audit(spark, sf):
    """Eval-integrity audit: val-split docs sharing a distinct 13-gram
    with ANY train-split doc (exact dups are removed upstream, but
    near-dups under the MinHash threshold can straddle the hash split and
    leak train content into eval). Same gram probe as decontamination with
    the train side as the 'benchmark' — but the train side is 90% OF THE
    CORPUS, not an eval suite, so the broadcast is GATED on its doc count
    (VERDICT r5 #1: an unconditional broadcast of a corpus split's gram
    set is a guaranteed executor OOM at 100 TB; above the gate the probe
    is a shuffle join on g, the correct scale shape)."""
    from data_collector_spark.functions.sketches import (
        contaminated_docs,
        word_hash_col,
    )

    d = load_table(spark, sf, "documents")
    h = word_hash_col(F.col("doc_id").cast("string"))
    d = d.withColumn("_split", F.when(h % 100 < 90, "train").otherwise("val"))
    train = d.filter(F.col("_split") == "train")
    val = d.filter(F.col("_split") == "val")
    return contaminated_docs(
        val, train, n=_DECONTAM_N, broadcast_benchmark="auto"
    ).select(
        "doc_id", F.col("n_hit_grams").cast("long").alias("n_leaked_grams")
    )


@query(
    "sequence_packing",
    r"""
    WITH t AS (SELECT doc_id,
                      CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) AS h,
                      CASE WHEN trim(text) = '' THEN 0
                           ELSE len(string_split_regex(trim(text), '\s+')) END AS n
               FROM documents),
         s AS (SELECT doc_id, n,
                      CAST(sum(n) OVER (ORDER BY h, doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
               FROM t WHERE n > 0)
    SELECT doc_id,
           CAST(cum - n AS BIGINT) AS start_tok,
           CAST((cum - n) // 2048 AS BIGINT) AS chunk_first,
           CAST((cum - 1) // 2048 AS BIGINT) AS chunk_last
    FROM s
    """,
)
def sequence_packing(spark, sf):
    """Concat-and-chunk sequence packing at max_seq_len 2048: each doc's
    token span in the deterministic hash-ordered stream and the chunk
    range it occupies. The engine computes the global prefix sum as the
    two-pass bucketed decomposition (functions/packing.py — no
    data-sized single-partition window); the oracle computes it as ONE
    global window, so the decomposition must be bit-identical."""
    from data_collector_spark.functions.packing import pack_sequences

    d = load_table(spark, sf, "documents")
    return pack_sequences(d, budget=2048)


@query(
    "packing_leakage_suite",
    rf"""
    WITH {_NGRAM_CTES},
    split AS (SELECT doc_id,
                     CASE WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
                               % 100 < 90
                          THEN 'train' ELSE 'val' END AS split
              FROM documents),
    tg AS (SELECT DISTINCT g FROM grams JOIN split USING (doc_id)
           WHERE split = 'train'),
    leak AS (SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_leaked_grams
             FROM grams g JOIN split s USING (doc_id) JOIN tg USING (g)
             WHERE s.split = 'val' GROUP BY 1),
    t AS (SELECT doc_id,
                 CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) AS h,
                 CASE WHEN trim(text) = '' THEN 0
                      ELSE len(string_split_regex(trim(text), '\s+')) END AS n
          FROM documents),
    spans AS (SELECT t.doc_id, n,
                     CAST(sum(n) OVER (PARTITION BY sp.split ORDER BY h, t.doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
              FROM t JOIN split sp USING (doc_id) WHERE n > 0)
    SELECT sp.doc_id, sp.split,
           CAST(cum - n AS BIGINT) AS start_tok,
           CAST((cum - n) // 2048 AS BIGINT) AS chunk_first,
           CAST((cum - 1) // 2048 AS BIGINT) AS chunk_last,
           l.n_leaked_grams
    FROM split sp
    LEFT JOIN spans USING (doc_id)
    LEFT JOIN leak l USING (doc_id)
    """,
)
def packing_leakage_suite(spark, sf):
    """The composed train/val MATERIALIZATION pass (r6, folding
    sequence_packing + split_leakage_audit under the driver gate as one
    row — the two operators share the deterministic hash split): every
    doc's split membership, its token span + chunk range in the PER-SPLIT
    concat-and-chunk stream at max_seq_len 2048 (no chunk straddles the
    split — a straddling chunk would leak val tokens into training
    batches), and for val docs the count of distinct 13-grams shared with
    ANY train doc (the eval-integrity audit).

    Scale shape: packing runs the two-pass bucketed prefix-sum
    decomposition (functions/packing.py — never a data-sized
    single-partition window; the oracle computes ONE global window per
    split, so the decomposition must be bit-identical), and the leakage
    probe uses the gated contaminated_docs path (doc-count gate: broadcast
    for eval-suite-sized probe sides, shuffle join for corpus splits).
    Wordless docs keep their rows with NULL spans; unleaked docs carry
    NULL counts."""
    from data_collector_spark.functions.packing import pack_sequences
    from data_collector_spark.functions.sketches import (
        contaminated_docs,
        word_hash_col,
    )

    d = load_table(spark, sf, "documents")
    h = word_hash_col(F.col("doc_id").cast("string"))
    d2 = d.withColumn("split", F.when(h % 100 < 90, "train").otherwise("val"))
    spans = pack_sequences(
        d2.select("doc_id", "text", "split"), budget=2048, partition_col="split"
    )
    train = d2.filter(F.col("split") == "train")
    val = d2.filter(F.col("split") == "val")
    leak = contaminated_docs(
        val, train, n=_DECONTAM_N, broadcast_benchmark="auto"
    ).select("doc_id", F.col("n_hit_grams").cast("long").alias("n_leaked_grams"))
    return (
        d2.select("doc_id", "split")
        .join(spans, "doc_id", "left")
        .join(leak, "doc_id", "left")
        .select(
            "doc_id", "split", "start_tok", "chunk_first", "chunk_last",
            "n_leaked_grams",
        )
    )


@query(
    "st_tumbling_window",
    """
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
    FROM events GROUP BY 1, 2
    """,
)
def st_tumbling_window(spark, sf):
    """Tumbling 1h event-time window — the batch twin of the Structured
    Streaming aggregation (streaming equivalence covered in pytest).

    r7: the grouping key is date_trunc('hour') rather than the
    window() struct — identical window_start for epoch-aligned 1 h
    tumbling windows (exactly what the oracle computes), with a plain
    timestamp group key instead of a struct through the aggregate."""
    ev = load_table(spark, sf, "events")
    return (
        ev.groupBy(
            F.date_trunc("hour", "ts").alias("window_start"), "event_type"
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("sum_value"),
        )
        .select("window_start", "event_type", "n", "sum_value")
    )
