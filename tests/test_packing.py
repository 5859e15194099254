"""Sequence packing: the bucketed two-pass prefix sum must reproduce the
global concat-and-chunk layout exactly — contiguous non-overlapping
spans covering [0, total_tokens), chunk ranges consistent with the
budget. (Bit-identity to a one-window global cumsum is pinned by the
DuckDB oracle in test_oracle_parity.)"""

from pyspark.sql import functions as F

from data_collector_spark.functions.packing import pack_sequences


def test_spans_are_contiguous_and_cover_the_stream(spark):
    docs = spark.createDataFrame(
        [(i, " ".join(f"w{i}_{j}" for j in range(1 + (i * 13) % 40)))
         for i in range(200)] + [(999, "   ")],  # empty doc drops out
        "doc_id long, text string",
    )
    budget = 16
    out = pack_sequences(docs, budget=budget).collect()
    assert len(out) == 200
    n_tok = {i: 1 + (i * 13) % 40 for i in range(200)}
    total = sum(n_tok.values())
    spans = sorted((r["start_tok"], r["start_tok"] + n_tok[r["doc_id"]], r)
                   for r in out)
    # contiguous, gap-free, starting at 0
    assert spans[0][0] == 0
    for (s1, e1, _), (s2, e2, _) in zip(spans, spans[1:]):
        assert e1 == s2
    assert spans[-1][1] == total
    # chunk range arithmetic
    for s, e, r in spans:
        assert r["chunk_first"] == s // budget
        assert r["chunk_last"] == (e - 1) // budget
        assert r["chunk_first"] <= r["chunk_last"]


def test_partitioned_packing_streams_are_independent(spark):
    """partition_col packs each value as its own stream: identical to
    packing the filtered subsets separately (so train/val never share a
    chunk)."""
    docs = spark.createDataFrame(
        [(i, " ".join(f"w{i}_{j}" for j in range(1 + i % 9)),
          "train" if i % 3 else "val")
         for i in range(120)],
        "doc_id long, text string, split string",
    )
    joint = pack_sequences(docs, budget=16, partition_col="split")
    both = {r["doc_id"]: r for r in joint.collect()}
    for split in ("train", "val"):
        solo = {
            r["doc_id"]: r
            for r in pack_sequences(
                docs.filter(F.col("split") == split), budget=16
            ).collect()
        }
        for i, r in solo.items():
            assert (
                both[i]["start_tok"], both[i]["chunk_first"], both[i]["chunk_last"]
            ) == (r["start_tok"], r["chunk_first"], r["chunk_last"]), (split, i)


def test_packing_is_stable_under_repartition(spark):
    docs = spark.createDataFrame(
        [(i, " ".join(f"t{i}_{j}" for j in range(1 + i % 7)))
         for i in range(80)],
        "doc_id long, text string",
    )
    a = sorted(map(tuple, pack_sequences(docs, budget=8).collect()))
    b = sorted(map(tuple, pack_sequences(docs.repartition(13), budget=8).collect()))
    assert a == b
