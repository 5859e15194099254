"""Layer-1 semantics for the repetition quality signals (the scalar text
functions are pinned by the DuckDB oracles in test_oracle_parity; the
repetition stats get planted cases here too since their discriminating
inputs — spam runs — are rare in the synthetic corpus)."""

from pyspark.sql import functions as F

from data_collector_spark.functions.textstats import (
    pii_hit_count_col,
    redact_pii_col,
    repetition_stats,
)


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


def test_pii_redaction_planted(spark):
    cases = [
        (1, "mail bob.smith+x@sub.example.co.uk now", "mail <EMAIL> now", 1),
        (2, "from 192.168.0.1 and 10.0.0.255.", "from <IP> and <IP>.", 2),
        (3, "call +1 555 000 1234 today", "call <PHONE> today", 1),
        # the IP is consumed by the IP pass; the greedy phone run extends
        # through the space-separated digit tail
        (4, "a@b.io 1.2.3.4 +49 30 1234567 9999999999",
         "<EMAIL> <IP> <PHONE>", 3),
        # bare digit runs with no leading '+' survive the phone pass
        (7, "order 12345678901 shipped", "order 12345678901 shipped", 0),
        (5, "no pii here at all", "no pii here at all", 0),
        # version strings: 1.2.3 (three octets) must NOT redact
        (6, "release 1.2.3 is out", "release 1.2.3 is out", 0),
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t, _, _ in cases], "id long, text string"
    )
    got = {
        r["id"]: (r["red"], r["n"])
        for r in df.select(
            "id",
            redact_pii_col(F.col("text")).alias("red"),
            pii_hit_count_col(F.col("text")).alias("n"),
        ).collect()
    }
    for i, _, want_red, want_n in cases:
        assert got[i] == (want_red, want_n), (i, got[i])


def test_repetition_caps_keep_wordless_docs(spark):
    """ADVICE r5: caps only drop docs ABOVE either fraction — docs with no
    words (empty / whitespace-only text, admitted by min_tokens=0) have no
    stats row and must pass through, not vanish in a semi-join."""
    from data_collector_spark.functions.textstats import apply_repetition_caps

    df = spark.createDataFrame(
        [
            (1, ""),                      # empty: no stats row
            (2, "   "),                   # whitespace-only: no stats row
            (3, "a b c d e"),             # distinct words: dup_frac 0
            (4, "spam spam spam spam"),   # dup_word_frac 0.75, top2gram 1.0
        ],
        "doc_id long, text string",
    )
    kept = {
        r["doc_id"]
        for r in apply_repetition_caps(
            df, max_dup_word_frac=0.5, max_top_2gram_frac=0.9
        ).collect()
    }
    assert kept == {1, 2, 3}
    # caps at 1.0 are a no-op: every doc passes, including the wordless
    noop = {
        r["doc_id"]
        for r in apply_repetition_caps(
            df, max_dup_word_frac=1.0, max_top_2gram_frac=1.0
        ).collect()
    }
    assert noop == {1, 2, 3, 4}
