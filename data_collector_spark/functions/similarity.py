"""Embedding similarity search: brute-force cosine top-k + LSH-bucketed ANN.

Not in the reference (no vector ops exist there); required for the
training-data pipeline over the ``embeddings`` table. Two paths:

- brute force: broadcast the (small) query set, cosine via built-in
  ``zip_with``/``aggregate`` higher-order functions — JVM-side, no UDF —
  then a per-query top-k window. Exact; the correctness baseline.
- random-hyperplane LSH: a deterministic hyperplane matrix (splitmix64
  seeded) signs each vector into a bucket signature via one vectorized
  pandas UDF (numpy matmul); candidates = bucket-equal pairs, verified
  with exact cosine. At 10^10 rows the bucket join replaces the cross
  join; recall is tunable by (n_planes, n_tables).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def cosine_col(a, b):
    """cos(a, b) over array<double> columns — built-ins only."""
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)
    na = F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))
    nb = F.sqrt(F.aggregate(F.transform(b, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))
    return dot / (na * nb)


def brute_force_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k per query. queries must be broadcast-small."""
    q = queries.select(
        F.col(id_col).alias("q_id"), _as_double(F.col(vec_col)).alias("qe")
    )
    c = candidates.select(
        F.col(id_col).alias("c_id"), _as_double(F.col(vec_col)).alias("ce")
    )
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("q_id") != F.col("c_id"))
        .select("q_id", "c_id", cosine_col(F.col("qe"), F.col("ce")).alias("sim"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("c_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("q_id", "c_id", F.round("sim", 4).alias("sim"))
    )


def _hyperplanes(n_planes: int, dim: int, seed: int) -> np.ndarray:
    """Deterministic pseudo-gaussian hyperplanes from splitmix64 bits."""
    n = n_planes * dim
    x = (np.arange(n, dtype=np.uint64) + np.uint64(seed * 1_000_003)) * np.uint64(
        0x9E3779B97F4A7C15
    )
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    x = x ^ (x >> np.uint64(31))
    u = x.astype(np.float64) / 2**64
    # sum of 2 uniforms - 1 ~ triangular(0): symmetric, zero-mean — fine for signs
    g = (u + np.roll(u, 1)) - 1.0
    return g.reshape(n_planes, dim)


def with_lsh_bucket(
    df: DataFrame,
    dim: int,
    n_planes: int = 16,
    seed: int = 42,
    vec_col: str = "embedding",
    out_col: str = "bucket",
) -> DataFrame:
    """Add a sign-pattern bucket id (one numpy matmul per Arrow batch)."""
    planes = _hyperplanes(n_planes, dim, seed)
    weights = (1 << np.arange(n_planes, dtype=np.int64))

    @F.pandas_udf(T.LongType())
    def bucket(v: pd.Series) -> pd.Series:
        mat = np.stack(v.to_numpy())  # (batch, dim)
        signs = (mat @ planes.T) > 0  # (batch, n_planes)
        return pd.Series((signs @ weights).astype(np.int64))

    return df.withColumn(out_col, bucket(F.col(vec_col)))


def with_ivf_cell(
    df: DataFrame,
    centroids: np.ndarray,
    nprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each vector to its nprobe nearest centroid cells (IVF lists).

    One numpy matmul per Arrow batch against the broadcast centroid
    matrix; output is exploded to (row, cell) pairs so cell assignment is
    an equi-join key downstream.
    """
    cn = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def cells(v: pd.Series) -> pd.Series:
        mat = np.stack(v.to_numpy()).astype(np.float64)
        mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        sims = mat @ cn.T  # (batch, K)
        top = np.argsort(-sims, axis=1)[:, :nprobe]
        return pd.Series([row.tolist() for row in top])

    return df.withColumn("_cells", cells(F.col(vec_col))).select(
        "*", F.explode("_cells").alias("cell")
    ).drop("_cells")


def ivf_centroids(
    candidates: DataFrame, k: int = 16, id_col: str = "vec_id", vec_col: str = "embedding"
) -> np.ndarray:
    """Deterministic coarse quantizer: the k lowest-id vectors as centroids.

    A k-means refinement is a drop-in replacement; determinism and
    partition-independence matter more than centroid quality here, and at
    10^10 scale you train the quantizer on a fixed sample anyway."""
    rows = (
        candidates.select(id_col, vec_col).orderBy(id_col).limit(k).collect()
    )
    return np.array([list(r[vec_col]) for r in rows], dtype=np.float64)


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
    cents = ivf_centroids(candidates, n_cells, id_col, vec_col)
    cq = with_ivf_cell(queries, cents, nprobe, id_col, vec_col).select(
        F.col(id_col).alias("q_id"), _as_double(F.col(vec_col)).alias("qe"), "cell"
    )
    cc = with_ivf_cell(candidates, cents, 1, id_col, vec_col).select(
        F.col(id_col).alias("c_id"), _as_double(F.col(vec_col)).alias("ce"), "cell"
    )
    scored = (
        cq.join(cc, "cell")
        .filter(F.col("q_id") != F.col("c_id"))
        .select("q_id", "c_id", cosine_col(F.col("qe"), F.col("ce")).alias("sim"))
        .dropDuplicates(["q_id", "c_id"])
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("c_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("q_id", "c_id", F.round("sim", 4).alias("sim"))
    )


def lsh_topk(
    queries: DataFrame,
    candidates: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k: bucket-equal candidates only, exact cosine re-rank."""
    qb = with_lsh_bucket(queries, dim, n_planes).select(
        F.col(id_col).alias("q_id"), _as_double(F.col(vec_col)).alias("qe"), "bucket"
    )
    cb = with_lsh_bucket(candidates, dim, n_planes).select(
        F.col(id_col).alias("c_id"), _as_double(F.col(vec_col)).alias("ce"), "bucket"
    )
    scored = (
        qb.join(cb, "bucket")
        .filter(F.col("q_id") != F.col("c_id"))
        .select("q_id", "c_id", cosine_col(F.col("qe"), F.col("ce")).alias("sim"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("c_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("q_id", "c_id", F.round("sim", 4).alias("sim"))
    )
