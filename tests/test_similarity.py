"""ANN quality: LSH and IVF top-k must achieve reasonable recall vs the
exact brute-force baseline, and IVF with nprobe=n_cells must be exact."""

from pyspark.sql import functions as F

from data_collector_spark.functions.similarity import brute_force_topk, ivf_topk, lsh_topk
from data_collector_spark.sources.tables import load_table


def pairs(df):
    return {(r["q_id"], r["c_id"]) for r in df.collect()}


def test_ivf_full_probe_is_exact(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5)
    exact = pairs(brute_force_topk(q, e, k=5))
    full = pairs(ivf_topk(q, e, k=5, n_cells=8, nprobe=8))
    assert full == exact


def test_ann_recall_reasonable(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    exact = pairs(brute_force_topk(q, e, k=5))
    # uniform synthetic embeddings are a worst case for ANN (neighbors are
    # barely closer than random); recall floors are correspondingly loose
    ivf = pairs(ivf_topk(q, e, k=5, n_cells=16, nprobe=8))
    dim = len(e.select("embedding").first()[0])
    lsh = pairs(lsh_topk(q, e, dim=dim, k=5, n_planes=2))
    assert len(ivf & exact) / len(exact) >= 0.8
    assert len(lsh & exact) / len(exact) >= 0.2


def test_ann_deterministic(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5)
    a = pairs(ivf_topk(q, e, k=5, n_cells=16, nprobe=4))
    b = pairs(ivf_topk(q, e, k=5, n_cells=16, nprobe=4))
    assert a == b
