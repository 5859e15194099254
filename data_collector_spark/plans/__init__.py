from data_collector_spark.plans.registry import QUERIES, ORACLES, query  # noqa: F401
import data_collector_spark.plans.relational  # noqa: F401,E402
import data_collector_spark.plans.training  # noqa: F401,E402
import data_collector_spark.plans.crawl_queries  # noqa: F401,E402

# The driver checks at most 50 queries (registration order) per round, so
# the driver-facing surface is this EXPLICIT 50-entry list covering every
# applicable SURVEY.md §2 operator row plus every training-data operator —
# no rotation, no eviction (VERDICT r2 task 1). Micro scalar-function
# queries are folded into composed suites (f_dates/f_events/f_strings/
# text_stats) whose fine-grained originals stay in QUERIES for the local
# oracle-parity mirror (tests/test_oracle_parity.py runs EVERYTHING).
DRIVER_EXPORT = [
    # flagship stateful crawl: raw artifacts (rows-only) + the SQL-checkable
    # invariant gate (triple-pass against constant zeros)
    "crawl_fetch_log",          # S1-S5, W1-W5, R1-R6, D1-D9 composite
    "crawl_seen_set",           # J5/S7 end-state
    "crawl_invariants",         # hard gate: dup/seq/seen/accounting == 0
    "st_tumbling_window",       # §2.11 streaming twin
    "multimodal_meta",          # multimodal plumbing (mapInPandas)
    "embedding_norm_stats",     # embedding stats (higher-order fns)
    "s7_idempotent_insert",     # S7
    "s8_merge_upsert",          # S8/S9/F4
    "set_ops_suite",            # U1 + U2/A8 + pivot (A9/A10 wide counters)
    # training-data operators (dedup / similarity / text)
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "dedup_exact",
    # dedup_jaccard_words' exact-word-set-baseline slot went to the r6
    # composed packing+leakage row (VERDICT r5 next #1); the baseline stays
    # registered and parity-mirror-checked, and MinHash remains the
    # driver-checked scale path for the same operator family
    "packing_leakage_suite",    # sequence_packing + split_leakage_audit
    "dedup_embedding_cosine",
    "dedup_ngram3_jaccard",
    "ann_cosine_topk",
    "text_stats_suite",         # lang-ID + quality + tokens + fingerprint + F16
    "training_filter_pipeline",  # + 13-gram benchmark decontamination (r5);
                                 # standalone `decontaminate` stays registry-only
    # training_split's slot grew into the composed split+mixing row (r6):
    # the same 90/10 hash-split semantics stay driver-checked through the
    # suite (split is a projected column of every output row), plus the
    # Pile/Dolma-style per-source mixing weights on the train side. The
    # standalone training_split and source_mixing rows stay registered and
    # parity-mirror-checked.
    "mixing_split_suite",
    # relational §2 rows
    "q1_pricing_summary",       # A-family flagship
    "p1_validity_filter",       # P1/P2/P3/F15
    "p4_flag_update",           # P4/P5/S6
    "p6_case_routing",          # P6/F6
    "f_strings_suite",          # F1+F11
    "f_dates_suite",            # F2+F3+F5+F7+F10
    "f_events_suite",           # F8+F9+F13
    "f12_explode_words",        # F12/F14
    "j1_inner_equijoin",
    "j2_broadcast_dims",
    "j3_semi_join",
    "j4_expression_key_join",
    "j5_anti_dedup_insert",
    "j6_blocklist_anti",
    "j7_guarded_update_join",
    "j8_partition_pruned_join",
    "j9_eligible_union_view",
    "j10_asof_join",
    "j11_range_join",
    "a1_max_checkpoint",        # A1/A2/F2
    "a3_max_per_key",
    "a4_stale_key_having",
    "a5_parity_membership",
    "a7_distinct_keys",
    "w1_wave_pop",
    "w2_two_tier_priority",
    "w3_sessionize",
    "w4_daily_budget",          # R2
    "w5_budget_pools",          # R4 key rotation (driver row since r4)
]

assert len(DRIVER_EXPORT) == 50, len(DRIVER_EXPORT)
_missing = [n for n in DRIVER_EXPORT if n not in QUERIES]
assert not _missing, f"DRIVER_EXPORT names not registered: {_missing}"
# every exported query has a value oracle except the two raw crawl artifacts
_no_oracle = [
    n for n in DRIVER_EXPORT
    if n not in ORACLES and n not in ("crawl_fetch_log", "crawl_seen_set")
]
assert not _no_oracle, f"driver-exported queries missing oracles: {_no_oracle}"

DRIVER_QUERIES = {n: QUERIES[n] for n in DRIVER_EXPORT}
DRIVER_ORACLES = {n: ORACLES[n] for n in DRIVER_EXPORT if n in ORACLES}
