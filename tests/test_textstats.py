"""Layer-1 semantics for the repetition quality signals (the scalar text
functions are pinned by the DuckDB oracles in test_oracle_parity; the
repetition stats get planted cases here too since their discriminating
inputs — spam runs — are rare in the synthetic corpus)."""

from data_collector_spark.functions.textstats import repetition_stats


def test_repetition_stats_planted(spark):
    docs = spark.createDataFrame(
        [
            (1, "spam spam spam spam"),          # pure run
            (2, "all words here are unique"),    # no repetition
            (3, "one"),                          # single word: no 2-grams
            (4, "ab ab cd ab ab"),               # mixed
            (5, "   "),                          # whitespace-only: dropped
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
    assert set(out) == {1, 2, 3, 4}
    # doc 1: 4 words 1 distinct -> dup 0.75; "spam spam" is all 3 2-grams
    assert out[1]["dup_word_frac"] == 0.75 and out[1]["top_2gram_frac"] == 1.0
    assert out[2]["dup_word_frac"] == 0.0 and out[2]["top_2gram_frac"] == 0.25
    # doc 3: one word, one distinct, zero 2-grams
    assert out[3]["dup_word_frac"] == 0.0 and out[3]["top_2gram_frac"] == 0.0
    # doc 4: 5 words 2 distinct -> 0.6; grams: ab-ab x2, ab-cd, cd-ab -> 2/4
    assert out[4]["dup_word_frac"] == 0.6 and out[4]["top_2gram_frac"] == 0.5
