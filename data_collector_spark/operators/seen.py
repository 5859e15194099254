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

At 10^10 keys the seen side of the exact backstop must never itself be
reshuffled: stored as Iceberg ``bucket(N, url_sha1)`` (or a bucketBy
parquet table, the in-sandbox twin) the left-anti plans with zero
Exchange on the seen scan — only the bounded candidate/suspect side
shuffles into the bucket layout (pinned by
test_plan_quality.py::test_seen_anti_join_bucketed_no_exchange, the
anti-join analog of the fetch-join SPJ pin).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from data_collector_spark.operators.bloom import ShardedBloom


def _observed(df: DataFrame, obs_sink: list[Observation] | None) -> DataFrame:
    if obs_sink is None:
        return df
    obs = Observation()
    obs_sink.append(obs)
    return df.observe(obs, F.count(F.lit(1)).alias("n"))


def dedup_against_seen(
    spark: SparkSession,
    candidates: DataFrame,
    seen: DataFrame | None,
    bloom: ShardedBloom | None = None,
    key: str = "url_sha1",
    input_count_obs: list[Observation] | None = None,
    bloom_dir: str | None = None,
) -> DataFrame:
    """Rows of ``candidates`` whose key is not in ``seen``.

    ``candidates`` must already be unique on key (dropDuplicates upstream).
    ``seen`` None/empty => everything is new.

    ``input_count_obs``: pass an empty list to receive Observations whose
    'n' values sum to |candidates| — counted on the branches this operator
    evaluates anyway, so the caller's dedup counter costs zero extra jobs
    (each branch is scanned exactly once per action, so the observations
    fire exactly once).

    ``bloom_dir``: when set, the Bloom probe runs shard-PARTITIONED —
    candidates shuffle on their shard id and each task reads only its
    shard's bitmap from ``bloom_dir`` — instead of broadcasting every
    shard to every executor (mandatory once the filter outgrows executor
    memory, e.g. 128 GiB at 10^10 keys).
    """
    if seen is None:
        return _observed(candidates, input_count_obs)
    # file-backed mode holds no driver-side bitmaps at all — shard presence
    # on disk is the "filter has content" signal there. The filter object
    # (ShardedBloom or the duck-typed ShardedCuckoo) knows its own shard
    # file naming, so ask it.
    has_filter = bloom is not None and (
        bloom.dir_has_shards(bloom_dir)
        if bloom_dir is not None
        else bool(bloom.bitmaps)
    )
    if has_filter:
        if bloom_dir is not None:
            flagged = bloom.with_maybe_seen_partitioned(
                spark, candidates, bloom_dir, key
            )
        else:
            flagged = bloom.with_maybe_seen(spark, candidates, key)
        definitely_new = _observed(
            flagged.filter(~F.col("maybe_seen")).drop("maybe_seen"), input_count_obs
        )
        suspects = _observed(
            flagged.filter(F.col("maybe_seen")).drop("maybe_seen"), input_count_obs
        )
        survivors = suspects.join(seen.select(key), key, "left_anti")
        return definitely_new.unionByName(survivors)
    return _observed(candidates, input_count_obs).join(
        seen.select(key), key, "left_anti"
    )
