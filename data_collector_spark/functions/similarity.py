"""Embedding similarity search: brute-force cosine top-k + LSH / IVF ANN.

Not in the reference (no vector ops exist there); required for the
training-data pipeline over the ``embeddings`` table. Three paths:

- brute force: broadcast the (small) query set, cosine via built-in
  ``zip_with``/``aggregate`` higher-order functions — JVM-side, no UDF —
  then a per-query top-k window. Exact; the correctness baseline.
- sign-LSH: ±1 hyperplanes (Charikar, STOC 2002) over integer-quantized
  vectors — ``round(1000 * x)`` — so the sign decision is EXACT integer
  arithmetic, bit-identical across Spark and the DuckDB oracle (a float
  dot product's summation order could flip a borderline sign). Candidates
  = bucket-equal pairs, verified with exact cosine. At 10^10 rows the
  bucket equi-join replaces the cross join; recall is tunable by n_planes.
- IVF: coarse cells = the first ``n_cells`` vectors by id (a filter, not
  a global sort — partition-prunable at any scale); assignment = nearest
  cell by integer-quantized L2 (exact arithmetic again, ties to the lower
  cell id); queries probe ``nprobe`` cells, exact cosine re-rank inside.

Everything is whole-stage-codegen expressions — no Python workers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from data_collector_spark.functions.detrand import plane_signs

QUANT_SCALE = 1000  # fixed-point scale for sign/assignment decisions


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def _quantized(col):
    """array<long>: round(SCALE * x) — the fixed-point view both engines
    compute identically (float32 -> double is exact; x1000 never lands on
    an exact .5 for non-contrived inputs)."""
    return F.transform(col, lambda x: F.round(x.cast("double") * QUANT_SCALE, 0).cast("long"))


def _dot_col(a, b):
    """Left-to-right fold dot product (the exact summation order
    cosine_col always used — FP-identical wherever it is evaluated)."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def _norm_col(a):
    """L2 norm, same fold order as cosine_col's inline norms."""
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))


def cosine_col(a, b):
    """cos(a, b) over array<double> columns — built-ins only."""
    return _dot_col(a, b) / (_norm_col(a) * _norm_col(b))


def _topk(scored: DataFrame, k: int) -> DataFrame:
    # rank by the ROUNDED similarity (c_id tiebreak): the oracle computes
    # the cosine with a different FP expression tree, so ranking raw
    # doubles would let sub-ulp differences swap near-tie candidates
    # between engines (CLAUDE.md float discipline: round on BOTH sides)
    w = Window.partitionBy("q_id").orderBy(
        F.desc(F.round("sim", 4)), F.asc("c_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("q_id", "c_id", F.round("sim", 4).alias("sim"))
    )


def brute_force_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k per query. queries must be broadcast-small.

    Norms are hoisted to per-row projections BEFORE the join (r7): the
    cross join evaluated each side's norm once per PAIR, so every
    candidate norm was recomputed |queries| times — only the dot product
    is inherently per-pair. Same fold order, FP-identical sims."""
    q = queries.select(
        F.col(id_col).alias("q_id"), _as_double(F.col(vec_col)).alias("qe")
    ).withColumn("_nq", _norm_col(F.col("qe")))
    c = candidates.select(
        F.col(id_col).alias("c_id"), _as_double(F.col(vec_col)).alias("ce")
    ).withColumn("_nc", _norm_col(F.col("ce")))
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("q_id") != F.col("c_id"))
        .select(
            "q_id", "c_id",
            (_dot_col(F.col("qe"), F.col("ce")) / (F.col("_nq") * F.col("_nc"))).alias("sim"),
        )
    )
    return _topk(scored, k)


def with_lsh_bucket(
    df: DataFrame,
    dim: int,
    n_planes: int = 8,
    seed: int = 42,
    vec_col: str = "embedding",
    out_col: str = "bucket",
) -> DataFrame:
    """Add a sign-pattern bucket id — pure codegen expressions.

    bucket = sum_p 2^p * [ sum_d signs[p][d] * round(1000*x_d) > 0 ]
    """
    signs = plane_signs(n_planes, dim, seed)
    with_q = df.withColumn("_q", _quantized(F.col(vec_col)))
    bucket = None
    for p, srow in enumerate(signs):
        sarr = F.array(*[F.lit(s).cast("long") for s in srow])
        dot = F.aggregate(
            F.zip_with("_q", sarr, lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )
        term = F.when(dot > 0, F.lit(1 << p).cast("long")).otherwise(F.lit(0).cast("long"))
        bucket = term if bucket is None else (bucket + term)
    return with_q.withColumn(out_col, bucket).drop("_q")


def lsh_topk(
    queries: DataFrame,
    candidates: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k: bucket-equal candidates only, exact cosine re-rank.
    Norms hoisted before the bucket join (see brute_force_topk)."""
    qb = with_lsh_bucket(queries, dim, n_planes).select(
        F.col(id_col).alias("q_id"), _as_double(F.col(vec_col)).alias("qe"), "bucket"
    ).withColumn("_nq", _norm_col(F.col("qe")))
    cb = with_lsh_bucket(candidates, dim, n_planes).select(
        F.col(id_col).alias("c_id"), _as_double(F.col(vec_col)).alias("ce"), "bucket"
    ).withColumn("_nc", _norm_col(F.col("ce")))
    scored = (
        qb.join(cb, "bucket")
        .filter(F.col("q_id") != F.col("c_id"))
        .select(
            "q_id", "c_id",
            (_dot_col(F.col("qe"), F.col("ce")) / (F.col("_nq") * F.col("_nc"))).alias("sim"),
        )
    )
    return _topk(scored, k)


def ivf_centroid_rows(
    candidates: DataFrame, n_cells: int = 16, id_col: str = "vec_id", vec_col: str = "embedding"
) -> list[tuple[int, list[float]]]:
    """Deterministic coarse quantizer: the vectors with id < n_cells,
    labelled by their own id.

    A *filter* (partition-prunable, no global sort — the previous
    orderBy().limit() shuffled the whole table at 10^10 rows) collecting
    exactly n_cells rows. A k-means refinement is a drop-in replacement;
    determinism and partition-independence matter more than centroid
    quality here, and at scale you train the quantizer on a fixed sample
    anyway."""
    rows = candidates.select(id_col, vec_col).filter(F.col(id_col) < n_cells).collect()
    return sorted((int(r[id_col]), [float(v) for v in r[vec_col]]) for r in rows)


def with_ivf_cells(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    nprobe: int = 1,
    vec_col: str = "embedding",
) -> DataFrame:
    """Explode each row to its nprobe nearest centroid cells (IVF lists).

    Nearest by integer-quantized L2 — sum_d (q_d - qc_d)^2 over
    round(1000*x) values, ties to the lower cell id — so cell assignment
    is exact arithmetic reproducible in ANSI SQL, and downstream it is a
    plain equi-join key."""
    with_q = df.withColumn("_q", _quantized(F.col(vec_col)))
    cells = []
    for cid, cvec in centroids:
        carr = F.array(*[F.lit(v).cast("double") for v in cvec])
        cq = F.transform(carr, lambda x: F.round(x * QUANT_SCALE, 0).cast("long"))
        dist = F.aggregate(
            F.zip_with("_q", cq, lambda x, y: (x - y) * (x - y)),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )
        cells.append(F.struct(dist.alias("d"), F.lit(cid).cast("long").alias("cell")))
    nearest = F.slice(F.array_sort(F.array(*cells)), 1, nprobe)
    return (
        with_q.withColumn("_cells", F.transform(nearest, lambda s: s["cell"]))
        .select("*", F.explode("_cells").alias("cell"))
        .drop("_cells", "_q")
    )


def ivf_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN top-k: candidates indexed into 1 cell each, queries probe
    their nprobe nearest cells, exact cosine re-rank within probed cells.

    The cell equi-join replaces the cross join: work ~ (nprobe / n_cells)
    of brute force, recall tunable via nprobe."""
    cents = ivf_centroid_rows(candidates, n_cells, id_col, vec_col)
    cq = with_ivf_cells(queries, cents, nprobe, vec_col).select(
        F.col(id_col).alias("q_id"), _as_double(F.col(vec_col)).alias("qe"), "cell"
    ).withColumn("_nq", _norm_col(F.col("qe")))
    cc = with_ivf_cells(candidates, cents, 1, vec_col).select(
        F.col(id_col).alias("c_id"), _as_double(F.col(vec_col)).alias("ce"), "cell"
    ).withColumn("_nc", _norm_col(F.col("ce")))
    scored = (
        cq.join(cc, "cell")
        .filter(F.col("q_id") != F.col("c_id"))
        .select(
            "q_id", "c_id",
            (_dot_col(F.col("qe"), F.col("ce")) / (F.col("_nq") * F.col("_nc"))).alias("sim"),
        )
        .dropDuplicates(["q_id", "c_id"])
    )
    return _topk(scored, k)
