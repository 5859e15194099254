"""Sequence packing: the concat-and-chunk step of a training pipeline.

Documents are concatenated in a deterministic hash order and the token
stream is sliced into fixed-length chunks (``budget`` tokens, e.g. the
model's max_seq_len); each doc is assigned its token span
``[start_tok, start_tok + n_tok)`` and the chunk range it lands in. The
span assignment is a GLOBAL prefix sum — the naive Spark form is a
single-partition window (a scale-killer at 10^10 docs), so it runs as the
classic two-pass distributed decomposition instead:

1. bucket each doc by the top bits of its order hash — bucket order IS
   hash order, so buckets partition the global sort into contiguous runs;
2. intra-bucket cumulative sums under ``Window.partitionBy(bucket)``
   (parallel, one shuffle);
3. per-bucket totals -> exclusive bucket offsets (a window over the
   BOUNDED bucket-totals table — ``n_buckets`` rows regardless of corpus
   size) broadcast-joined back.

Integer arithmetic throughout, so the decomposition is bit-identical to
the global cumsum the DuckDB oracle computes in one window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from data_collector_spark.functions.sketches import word_hash_col
from data_collector_spark.functions.textstats import token_count_col

# word_hash_col yields 60-bit non-negative ints; top 10 bits -> 1024
# contiguous hash-range buckets
_HASH_BITS = 60
_BUCKET_BITS = 10


def pack_sequences(
    docs: DataFrame,
    budget: int = 2048,
    id_col: str = "doc_id",
    text_col: str = "text",
    partition_col: str | None = None,
) -> DataFrame:
    """(id, start_tok, chunk_first, chunk_last) per non-empty doc: the
    doc's position in the concatenated deterministic-order token stream
    and the [first, last] fixed-size chunk it occupies. Docs shorter than
    a chunk share chunks; docs longer than a chunk span several — exactly
    the GPT-style concat-then-slice layout.

    ``partition_col`` packs each partition value as its OWN stream
    (spans restart at 0 per value): pass the split column so train and
    val never share a chunk — a chunk straddling the split would leak
    val tokens into training batches."""
    t = docs.select(
        *([partition_col] if partition_col else []),
        F.col(id_col),
        word_hash_col(F.col(id_col).cast("string")).alias("_h"),
        token_count_col(F.col(text_col)).alias("_n"),
    ).filter(F.col("_n") > 0)
    # exact integer bucket: top bits of the order hash (shiftright, not a
    # double division — monotone but boundary-shifting for hashes > 2^53)
    t = t.withColumn("_b", F.shiftright("_h", _HASH_BITS - _BUCKET_BITS))
    pcols = [partition_col] if partition_col else []
    # pass 2: intra-bucket cumsum (parallel across buckets)
    intra = Window.partitionBy("_b", *pcols).orderBy("_h", id_col)
    t = t.withColumn("_cum_in", F.sum("_n").over(intra))
    # pass 3: exclusive offsets over the bounded bucket-totals table
    totals = t.groupBy("_b", *pcols).agg(F.sum("_n").alias("_tot"))
    off_w = (
        Window.partitionBy(*pcols).orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, -1)
        if pcols
        else Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    )  # n_buckets rows total — bounded single-partition window, not data-sized
    offsets = totals.select(
        "_b", *pcols, F.coalesce(F.sum("_tot").over(off_w), F.lit(0)).alias("_off")
    )
    packed = t.join(F.broadcast(offsets), ["_b", *pcols]).select(
        id_col,
        (F.col("_off") + F.col("_cum_in") - F.col("_n")).alias("start_tok"),
        F.col("_n").alias("_n"),
    )
    return packed.select(
        id_col,
        F.col("start_tok").cast("long").alias("start_tok"),
        F.expr(f"start_tok div {budget}").cast("long").alias("chunk_first"),
        F.expr(f"(start_tok + _n - 1) div {budget}").cast("long").alias("chunk_last"),
    )
