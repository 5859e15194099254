"""data_collector_spark — a PySpark-native batch-iterative URL-frontier crawler
engine with the query/data-processing capabilities of dtrosien/data-collector.

This is NOT a port of the Rust reference: the reference's async task-DAG of
HTTP collectors + SQL stagers (see /root/reference/src/dag_schedule/,
src/actions/) is re-expressed as a checkpointed loop of Spark jobs over
snapshot-committed tables:

- collectors' frontier cursors  -> priority-wave pop (window top-B per host)
- ON CONFLICT DO NOTHING dedup  -> sharded Bloom prefilter + left-anti join
- api-key rate budgets          -> per-host politeness budgets per round
- source_symbol_warden blocklist-> robots table broadcast anti-join
- is_staged flags / max(date)   -> round-partitioned state + atomic checkpoint

Layout:
    functions/  canonicalization, extraction, text analytics, dedup sketches
    operators/  seen-set, politeness window, robots filter, merge/upsert
    sources/    deterministic synthetic page generator, warehouse, testdata
    crawler/    round loop, checkpoint state, metrics
    plans/      SURVEY.md §2 operator inventory as (spark, sf_dir) queries
"""

__version__ = "0.1.0"
