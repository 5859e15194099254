"""MERGE/upsert + coalesce-merge — the reference's stager sinks.

Reference semantics being re-expressed (SURVEY.md S8/S9/J7/F4):

- ``ON CONFLICT (k) DO UPDATE SET x = EXCLUDED.x``
  (/root/reference/src/database/polygon_dividends_service.rs:51-113)
- coalesce-merge fill-missing updates
  (/root/reference/src/actions/stage/polygon_grouped_daily.rs:284-297)
- guarded updates — only where the source adds information
  (polygon_grouped_daily.rs:492-517)

On Iceberg this is ``MERGE INTO``; without the jars it's the classic
three-way split, which Catalyst executes as two joins over one shuffle
of each side (AQE dedups the exchange):

    matched   = target ⋈ updates  (update payload wins / coalesce)
    unmatched = target ⟕̸ updates  (left anti — rows to keep)
    inserts   = updates ⟕̸ target  (left anti — rows to add)
    result    = matched ∪ unmatched ∪ inserts
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame,
    updates: DataFrame,
    keys: list[str],
    set_cols: list[str] | None = None,
    coalesce_missing: bool = False,
) -> DataFrame:
    """MERGE INTO target USING updates ON keys
    WHEN MATCHED THEN UPDATE SET set_cols WHEN NOT MATCHED THEN INSERT.

    coalesce_missing=True keeps the target value where the update is NULL
    (the reference's ``coalesce(md.x, src.x)`` fill-missing merge, F4).
    """
    value_cols = [c for c in target.columns if c not in keys]
    set_cols = set_cols if set_cols is not None else value_cols

    u = updates.select(
        *[F.col(k) for k in keys],
        *[F.col(c).alias(f"_u_{c}") for c in set_cols],
    )
    matched = target.join(u, keys, "inner").select(
        *keys,
        *[
            (
                F.coalesce(F.col(f"_u_{c}"), F.col(c))
                if coalesce_missing
                else F.col(f"_u_{c}")
            ).alias(c)
            if c in set_cols
            else F.col(c)
            for c in value_cols
        ],
    )
    unmatched = target.join(updates.select(*keys), keys, "left_anti")
    inserts = updates.join(target.select(*keys), keys, "left_anti").select(
        *keys, *[F.col(c) if c in updates.columns else F.lit(None).alias(c) for c in value_cols]
    )
    return matched.unionByName(unmatched.select(*keys, *value_cols)).unionByName(
        inserts.select(*keys, *value_cols)
    )
