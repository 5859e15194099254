"""Benchmark decontamination (13-gram eval-overlap rule): planted
contamination is caught exactly, near-misses are not, and the
shuffle-join fallback equals the broadcast probe."""

from pyspark.sql import functions as F

from data_collector_spark.functions.sketches import contaminated_docs, word_ngrams

BENCH_TEXT = " ".join(f"b{i}" for i in range(20))  # 20 words -> 8 13-grams


def _docs(spark):
    # doc 1: copies a 15-word window of the benchmark verbatim -> 3
    #        13-grams, every one present in the benchmark
    contaminated = " ".join(f"b{i}" for i in range(2, 17))
    # doc 2: shares 12 consecutive words (one short of a 13-gram) plus
    #        noise -> word overlap but ZERO gram overlap
    near_miss = " ".join(f"b{i}" for i in range(5, 17)) + " zzz " + " ".join(
        f"c{i}" for i in range(20)
    )
    # doc 3: disjoint vocabulary entirely
    clean = " ".join(f"d{i}" for i in range(30))
    # doc 4: the full benchmark text repeated (duplicate grams must count
    #        once: DISTINCT per doc)
    dup = BENCH_TEXT + " " + BENCH_TEXT
    return spark.createDataFrame(
        [(1, contaminated), (2, near_miss), (3, clean), (4, dup)],
        "doc_id long, text string",
    )


def test_word_ngrams_count_and_bounds(spark):
    docs = spark.createDataFrame([(1, BENCH_TEXT), (2, "a b c")], "doc_id long, text string")
    grams = word_ngrams(docs, 13).collect()
    # 20 words -> 20-13+1 = 8 grams; the 3-word doc yields none
    assert len(grams) == 8
    assert all(r["doc_id"] == 1 and len(r["g"].split(" ")) == 13 for r in grams)


def test_planted_contamination_is_exact(spark):
    bench = spark.createDataFrame([(100, BENCH_TEXT)], "doc_id long, text string")
    hits = {
        r["doc_id"]: r["n_hit_grams"]
        for r in contaminated_docs(_docs(spark), bench, n=13).collect()
    }
    # doc 1: window words b2..b16 -> 13-grams starting at b2, b3, b4
    # doc 4: all 8 benchmark grams, counted once despite the repeat
    assert hits == {1: 3, 4: 8}


def test_shuffle_fallback_matches_broadcast(spark):
    bench = spark.createDataFrame([(100, BENCH_TEXT)], "doc_id long, text string")
    docs = _docs(spark)
    bcast = sorted(map(tuple, contaminated_docs(docs, bench, n=13).collect()))
    shuf = sorted(
        map(
            tuple,
            contaminated_docs(
                docs, bench, n=13, broadcast_benchmark=False
            ).collect(),
        )
    )
    assert bcast == shuf


def test_auto_gate_both_regimes_match(spark):
    """VERDICT r5 #1: the "auto" doc-count gate must pick broadcast below
    the threshold and shuffle above it, with identical rows either way
    (the same equivalence contract the robots broadcast gate pins)."""
    bench = spark.createDataFrame([(100, BENCH_TEXT)], "doc_id long, text string")
    docs = _docs(spark)
    expected = sorted(map(tuple, contaminated_docs(docs, bench, n=13).collect()))
    # gate comfortably above the 1-doc benchmark -> broadcast branch
    small = sorted(map(tuple, contaminated_docs(
        docs, bench, n=13, broadcast_benchmark="auto", broadcast_max_docs=10
    ).collect()))
    # gate below it -> shuffle branch (the corpus-split regime)
    large = sorted(map(tuple, contaminated_docs(
        docs, bench, n=13, broadcast_benchmark="auto", broadcast_max_docs=0
    ).collect()))
    assert small == expected
    assert large == expected


def test_auto_gate_token_volume_triggers_shuffle(spark):
    """VERDICT r6 #3: the auto gate must bound gram VOLUME, not just doc
    count — FEW very long docs (grams scale with tokens) must take the
    shuffle branch even when the doc count is under the doc cap, with
    rows identical to the broadcast branch."""
    long_text = " ".join(f"b{i % 20}x{i}" for i in range(500))  # 500 tokens
    bench = spark.createDataFrame(
        [(100, long_text), (101, BENCH_TEXT)], "doc_id long, text string"
    )
    docs = _docs(spark).unionByName(
        spark.createDataFrame([(5, long_text)], "doc_id long, text string")
    )
    expected = sorted(map(tuple, contaminated_docs(docs, bench, n=13).collect()))
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        # 2 docs pass the 10-doc cap, but 520 tokens > 100 -> shuffle
        gated = contaminated_docs(
            docs, bench, n=13, broadcast_benchmark="auto",
            broadcast_max_docs=10, broadcast_max_tokens=100,
        )
        plan = gated._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan
        assert sorted(map(tuple, gated.collect())) == expected
        # raise the token cap -> broadcast again
        loose = contaminated_docs(
            docs, bench, n=13, broadcast_benchmark="auto",
            broadcast_max_docs=10, broadcast_max_tokens=10_000,
        )
        assert "BroadcastHashJoin" in (
            loose._jdf.queryExecution().executedPlan().toString()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_broadcast_benchmark_rejects_unknown_strings(spark):
    """ADVICE r6: any string other than 'auto' must raise, not silently
    take the always-broadcast branch."""
    import pytest

    bench = spark.createDataFrame([(100, BENCH_TEXT)], "doc_id long, text string")
    for bad in ("Auto", "shuffle", "false"):
        with pytest.raises(ValueError, match="broadcast_benchmark"):
            contaminated_docs(_docs(spark), bench, n=13, broadcast_benchmark=bad)


def test_auto_gate_plan_shape(spark):
    """Above the gate the probe plans as a shuffle join (no
    BroadcastHashJoin for the gram join); below it, broadcast. Auto-
    broadcast is disabled so the hint — not the tiny test size — decides."""
    bench = spark.createDataFrame([(100, BENCH_TEXT)], "doc_id long, text string")
    docs = _docs(spark)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        over = contaminated_docs(
            docs, bench, n=13, broadcast_benchmark="auto", broadcast_max_docs=0
        )
        p_over = over._jdf.queryExecution().executedPlan().toString()
        under = contaminated_docs(
            docs, bench, n=13, broadcast_benchmark="auto", broadcast_max_docs=10
        )
        p_under = under._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "BroadcastHashJoin" not in p_over
    assert "BroadcastHashJoin" in p_under
