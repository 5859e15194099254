"""Streaming twins of the crawl's dedup + politeness operators.

The reference absorbs duplicates with PK upserts and budgets with a
driver-side key manager (/root/reference/src/api_keys/key_manager.rs:
52-90); the engine's batch rounds re-express both. For stream sources
(kafka URL feeds, file drops) the same semantics come from Structured
Streaming primitives:

- seen-set dedup  -> ``dropDuplicatesWithinWatermark`` on url_sha1 (the
  streaming ON CONFLICT DO NOTHING: a key is admitted once; late
  duplicates inside the watermark are dropped by state, and state is
  evicted after the watermark so it doesn't grow unboundedly — the
  streaming analog of the Bloom-bounded seen set);
- per-host budget -> ``applyInPandasWithState``: a custom stateful
  operator tracking cumulative spend per host across micro-batches and
  admitting at most ``budget`` URLs per host (R1/R2's give-up branch —
  over-budget URLs are emitted with admitted=false, the deferred set).

Both are pytest-equivalence-checked against their batch twins.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

ADMIT_SCHEMA = "host string, url_sha1 string, admitted boolean, spent_after bigint"
_STATE_SCHEMA = "spent bigint"


def streaming_seen_dedup(
    stream: DataFrame, ts_col: str = "discovery_ts", watermark: str = "2 hours"
) -> DataFrame:
    """First sighting of each url_sha1 passes; later duplicates are
    dropped while their key is inside the watermark window."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["url_sha1"]
    )


def streaming_host_budget(stream: DataFrame, budget: int) -> DataFrame:
    """Stateful per-host admission: across all micro-batches, at most
    ``budget`` URLs per host are admitted (admitted=true); the rest stream
    through flagged false (the deferred/give-up branch). Deterministic:
    urls are ranked by url_sha1 within each batch.

    State is one bigint per host — bounded by the host universe, the same
    cardinality the batch budget table carries.
    """

    def admit(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (host,) = key
        spent = state.get[0] if state.exists else 0
        # a >maxRecordsPerBatch host group arrives as MULTIPLE Arrow
        # chunks; ranking must be global per (host, micro-batch), not
        # per-chunk, or chunk boundaries would decide admission
        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf.sort_values("url_sha1").reset_index(drop=True)
        n = len(pdf)
        admit_n = max(0, min(n, budget - spent))
        admitted = [i < admit_n for i in range(n)]
        spent += admit_n
        state.update((spent,))
        yield pd.DataFrame(
            {
                "host": [host] * n,
                "url_sha1": pdf["url_sha1"],
                "admitted": admitted,
                "spent_after": [spent] * n,
            }
        )

    return stream.groupBy("host").applyInPandasWithState(
        admit,
        outputStructType=ADMIT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
