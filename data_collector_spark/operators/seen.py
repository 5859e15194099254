"""URL-seen dedup: Bloom prefilter + exact anti-join backstop.

Semantics of the reference's ``INSERT ... ON CONFLICT DO NOTHING``
(/root/reference/src/actions/collect/nyse_events.rs:145-156) and its
insert-select anti-dedup (/root/reference/src/actions/stage/
sec_companies.rs:52-56, SURVEY.md J5/S7): a candidate row survives iff its
key is not already present.

Scale shape: candidates split on the Bloom verdict —
  definitely-new  -> pass through, zero shuffle
  maybe-seen      -> exact left-anti join against the seen table
so only (true dups + Bloom false positives) pay the shuffle. With fp ~1%
the anti-join input shrinks by ~99% for genuinely-new-heavy rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_collector_spark.operators.bloom import ShardedBloom


def dedup_against_seen(
    spark: SparkSession,
    candidates: DataFrame,
    seen: DataFrame | None,
    bloom: ShardedBloom | None = None,
    key: str = "url_sha1",
) -> DataFrame:
    """Rows of ``candidates`` whose key is not in ``seen``.

    ``candidates`` must already be unique on key (dropDuplicates upstream).
    ``seen`` None/empty => everything is new.
    """
    if seen is None:
        return candidates
    if bloom is not None and bloom.bitmaps:
        flagged = bloom.with_maybe_seen(spark, candidates, key)
        definitely_new = flagged.filter(~F.col("maybe_seen")).drop("maybe_seen")
        suspects = flagged.filter(F.col("maybe_seen")).drop("maybe_seen")
        survivors = suspects.join(seen.select(key), key, "left_anti")
        return definitely_new.unionByName(survivors)
    return candidates.join(seen.select(key), key, "left_anti")
