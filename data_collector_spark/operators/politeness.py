"""Politeness-budgeted priority-wave pop.

Re-expresses two reference mechanisms at once (SURVEY.md W1-W3, R1-R5):

- the frontier cursor ``WHERE symbol > $1 ORDER BY symbol LIMIT 1``
  (/root/reference/src/database/master_data_service.rs:77-90) which pops
  one key at a time, and
- the API-key budget manager (5 req/min, /root/reference/src/api_keys/
  api_key.rs:231-238) which *sleeps* when a budget is exhausted
  (key_manager.rs:52-90).

Executors never sleep: each round pops a whole *wave* — per host, the top
``budget_per_round`` frontier URLs by (priority, depth, discovery_ts,
url_sha1) — and everything over budget is deferred to the next round
(counter: deferred_by_politeness, the reference's give-up branch at
key_manager.rs:74-83).

Skew handling (north_rule; the reference never needed it): a hot host may
hold most of the frontier, and a per-host window sorts the whole host in
one task. So stage 1 salts the window — top-Bmax per (host, salt) — which
bounds any window partition to ~|host|/S rows; stage 2 ranks the <= S*Bmax
survivors per host exactly. Both stages are JVM window ops (no UDF); the
deferred set is recovered with a broadcast anti-join against the small wave.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

ORDER_COLS = ("priority", "depth", "discovery_ts", "url_sha1")


def pop_wave(
    frontier: DataFrame,
    budgets: DataFrame,
    default_budget: int = 2,
    skew_salt: int = 16,
) -> tuple[DataFrame, DataFrame]:
    """-> (wave with seq_in_host, deferred). Deterministic given the inputs.

    budgets: (host, budget_per_round); row with host='' sets the default,
    overriding ``default_budget`` (mirrors the per-provider budgets of
    /root/reference/src/api_keys/api_key.rs:164-166,234-236).
    """
    brows = [(r["host"], int(r["budget_per_round"])) for r in budgets.collect()]
    bmap = dict(brows)
    default_budget = bmap.pop("", default_budget)
    bmax = max([default_budget, *bmap.values()]) if bmap else default_budget

    spark = frontier.sparkSession
    if bmap:
        bdf = spark.createDataFrame(
            list(bmap.items()), "host string, budget_per_round int"
        )
        f = frontier.join(F.broadcast(bdf), "host", "left").withColumn(
            "_budget", F.coalesce("budget_per_round", F.lit(default_budget))
        ).drop("budget_per_round")
    else:
        f = frontier.withColumn("_budget", F.lit(default_budget))

    order = [F.col(c).asc() for c in ORDER_COLS]

    # stage 1: salted pre-trim bounds window-partition size under skew
    salted = f.withColumn("_salt", F.pmod(F.xxhash64("url_sha1"), F.lit(skew_salt)))
    w1 = Window.partitionBy("host", "_salt").orderBy(*order)
    cand = (
        salted.withColumn("_rn1", F.row_number().over(w1))
        .filter(F.col("_rn1") <= bmax)
        .drop("_rn1", "_salt")
    )

    # stage 2: exact per-host rank over the bounded candidate set
    w2 = Window.partitionBy("host").orderBy(*order)
    ranked = cand.withColumn("seq_in_host", F.row_number().over(w2))
    wave = ranked.filter(F.col("seq_in_host") <= F.col("_budget")).drop("_budget")

    deferred = frontier.join(
        F.broadcast(wave.select("url_sha1")), "url_sha1", "left_anti"
    )
    return wave, deferred
