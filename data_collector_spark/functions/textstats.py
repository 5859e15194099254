"""Text analytics over the documents table: language-ID, quality scoring,
token counting, fingerprinting — all built-in expressions (codegen'd), so
each is SQL-oracle-checkable and runs JVM-side at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# marker words per language for the n-gram/stopword heuristic
LANG_MARKERS = {
    "en": r"\b(the|a|of|and)\b",
    "de": r"\b(der|und|die|das)\b",
    "fr": r"\b(le|et|la|les)\b",
}

STOPWORD_RE = r"\b(the|a|of|and|to|in)\b"
BPE_ISH_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def marker_count(text: Column, pattern: str) -> Column:
    # regexp_count == size(regexp_extract_all(..., 0)) — same java.util.regex
    # non-overlapping left-to-right scan — without materializing the match
    # array per row (r7, guide §1.2 per-task work)
    return F.regexp_count(text, F.lit(pattern))


def lang_id_col(text: Column) -> Column:
    """Deterministic argmax-with-precedence over marker counts (en>de>fr)."""
    en = marker_count(text, LANG_MARKERS["en"])
    de = marker_count(text, LANG_MARKERS["de"])
    fr = marker_count(text, LANG_MARKERS["fr"])
    return (
        F.when((en >= de) & (en >= fr) & (en > 0), "en")
        .when((de >= fr) & (de > 0), "de")
        .when(fr > 0, "fr")
        .otherwise("und")
    )


def token_count_col(text: Column) -> Column:
    """Whitespace tokens (empty string -> 0).

    Kept as split+size: the "obvious" allocation-free rewrite
    (regexp_count of separator runs + 1) measured ~20% SLOWER at sf1.0
    (quality pass 1.57 -> 1.87 s, 5-sample A/B) — Spark's split fast-path
    beats an extra full regex count pass despite the array it builds."""
    trimmed = F.trim(text)
    return F.when(trimmed == "", 0).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    ).cast("long")


def bpe_ish_count_col(text: Column) -> Column:
    """BPE-ish unit count: letter runs, digit runs, single punctuation."""
    return F.regexp_count(text, F.lit(BPE_ISH_RE)).cast("long")


def quality_score_col(text: Column) -> Column:
    """[0,1] heuristic: length saturation + stopword presence."""
    n_tokens = token_count_col(text).cast("double")
    stop = F.regexp_count(text, F.lit(STOPWORD_RE)).cast("double")
    stop_ratio = F.when(n_tokens > 0, stop / n_tokens).otherwise(F.lit(0.0))
    len_sat = F.least(F.lit(1.0), n_tokens / F.lit(50.0))
    return F.round(0.5 * len_sat + 0.5 * F.least(F.lit(1.0), 4.0 * stop_ratio), 4)


def fingerprint_col(text: Column) -> Column:
    """Content fingerprint: md5 of whitespace-normalized lowercased text."""
    return F.md5(F.lower(F.regexp_replace(F.trim(text), r"\s+", " ")))


# PII patterns kept to syntax both regex engines (java.util.regex here,
# RE2 in the DuckDB oracle) interpret identically: character classes,
# bounded/unbounded repetition, ASCII \b. Order matters — emails contain
# dots+digits and IPs contain digits, so the narrower patterns run first
# and their placeholders hide the consumed spans from the later ones.
PII_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (r"\+\d[\d ]{7,}\d\b", "<PHONE>"),
]


def redact_pii_col(text: Column) -> Column:
    """Scrub emails / IPv4 addresses / +international phone runs to typed
    placeholders — the C4/Dolma-style PII pass, pure regexp_replace chain
    (codegen, oracle-replayable)."""
    out = text
    for pat, tok in PII_PATTERNS:
        out = F.regexp_replace(out, pat, tok)
    return out


def pii_hit_count_col(text: Column) -> Column:
    """How many PII spans redact_pii_col would replace (for audit stats).
    Counted pattern-by-pattern on the PROGRESSIVELY redacted text, so
    overlapping classes (IP digits inside a phone-ish run) are counted
    once, matching the replacement chain exactly. Each redaction stage is
    referenced twice (count + next replace), so stages bind through
    ``urls._bind`` — Catalyst re-evaluates bare Column references and a
    naive chain goes multiplicative (CLAUDE.md)."""
    from data_collector_spark.functions.urls import _bind

    def _next(i: int):
        # single-arg lambda on purpose: transform() passes the element
        # index to two-arg lambdas, which would shadow a default-arg i
        return lambda nxt: count_from(i + 1, nxt)

    def count_from(i: int, cur: Column) -> Column:
        c = F.regexp_count(cur, F.lit(PII_PATTERNS[i][0]))
        if i == len(PII_PATTERNS) - 1:
            return c  # the final replace would be dead — never build it
        return c + _bind(
            F.regexp_replace(cur, PII_PATTERNS[i][0], PII_PATTERNS[i][1]),
            _next(i),
        )

    return _bind(text, lambda t: count_from(0, t)).cast("long")


def repetition_stats(docs, id_col: str = "doc_id", text_col: str = "text"):
    """Gopher/MassiveText-style repetition quality signals, word-level
    (the published rules use lines/paragraphs too; this corpus' text is
    single-line, so the word and 2-gram variants are the discriminating
    ones):

    - ``dup_word_frac``  = 1 - distinct words / total words
    - ``top_2gram_frac`` = occurrences of the most frequent word 2-gram
      / total 2-grams (0.0 for docs with fewer than 2 words)

    One row per doc with >= 1 word after trim. Everything is exploded
    word/gram aggregation — two shuffles on doc_id, codegen'd, no Python.
    High values flag boilerplate/spam for the filter pipeline the same
    way quality_score_col flags thin text."""
    ws = (
        docs.filter(F.trim(text_col) != "")
        .select(id_col, F.split(F.trim(text_col), r"\s+").alias("ws"))
    )
    wstats = (
        ws.select(id_col, F.explode("ws").alias("w"))
        .groupBy(id_col)
        .agg(
            F.count("*").alias("_n"),
            F.count_distinct("w").alias("_nd"),
        )
    )
    grams = ws.filter(F.size("ws") >= 2).select(
        id_col,
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("ws") - 2),
                lambda i: F.concat_ws(" ", F.get("ws", i), F.get("ws", i + 1)),
            )
        ).alias("g2"),
    )
    gstats = (
        grams.groupBy(id_col, "g2")
        .agg(F.count("*").alias("_c"))
        .groupBy(id_col)
        .agg(F.max("_c").alias("_top"), F.sum("_c").alias("_tot"))
    )
    return wstats.join(gstats, id_col, "left").select(
        id_col,
        F.round(F.lit(1.0) - F.col("_nd") / F.col("_n"), 4).alias("dup_word_frac"),
        F.round(
            F.coalesce(F.col("_top") / F.col("_tot"), F.lit(0.0)), 4
        ).alias("top_2gram_frac"),
    )


def apply_repetition_caps(
    df,
    max_dup_word_frac: float | None = None,
    max_top_2gram_frac: float | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Filter ``df`` by the Gopher repetition caps: docs ABOVE either
    fraction are dropped, everything else passes. LEFT join against
    repetition_stats, not semi (ADVICE r5): empty/whitespace-only docs
    have NO stats row (no words), and "caps only drop docs above either
    fraction" means a doc with no words must pass — NULL stats coalesce
    to keep."""
    rep = repetition_stats(df.select(id_col, text_col), id_col, text_col)
    cond = F.lit(True)
    if max_dup_word_frac is not None:
        cond = cond & F.coalesce(
            F.col("dup_word_frac") <= max_dup_word_frac, F.lit(True)
        )
    if max_top_2gram_frac is not None:
        cond = cond & F.coalesce(
            F.col("top_2gram_frac") <= max_top_2gram_frac, F.lit(True)
        )
    return (
        df.join(rep, id_col, "left")
        .filter(cond)
        .drop("dup_word_frac", "top_2gram_frac")
    )
