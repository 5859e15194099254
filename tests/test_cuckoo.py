"""Sharded cuckoo filter: no false negatives (incl. spillover under
pressure), deletion semantics, persistence, file-backed build/probe
equivalence, and crawl-level parity with the Bloom filter."""

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_collector_spark.operators.cuckoo import (
    SLOTS,
    CuckooSchemeMismatch,
    ShardedCuckoo,
    _insert_all,
)
from data_collector_spark.operators.seen import dedup_against_seen


def sha_df(spark, values):
    rows = [(hashlib.sha1(v.encode()).hexdigest(), v) for v in values]
    return spark.createDataFrame(rows, "url_sha1 string, url_canon string")


def _hash_batch(n, seed=0):
    digs = [hashlib.sha1(f"{seed}-{i}".encode()).digest() for i in range(n)]
    h1 = np.array(
        [int.from_bytes(d[:8], "big") for d in digs], dtype=np.uint64
    )
    h2 = np.array(
        [int.from_bytes(d[8:16], "big") for d in digs], dtype=np.uint64
    )
    return h1, h2


def test_bulk_insert_matches_sequential_bytes():
    """The vectorized bulk path must be byte-identical to the sequential
    build — sparse tables take the bulk path, the dense case falls back,
    and idempotent re-adds are no-ops in both modes."""
    for m, n in [(1 << 12, 500), (64, 300), (256, 900)]:
        t_bulk = np.zeros((m, SLOTS), dtype=np.uint16)
        t_seq = np.zeros((m, SLOTS), dtype=np.uint16)
        sp_bulk, sp_seq = [], []
        for seed in range(3):
            h1, h2 = _hash_batch(n, seed)
            _insert_all(t_bulk, sp_bulk, h1, h2, m)
            _insert_all(t_seq, sp_seq, h1, h2, m, force_sequential=True)
            # re-adding the same batch must change nothing (retry safety)
            _insert_all(t_bulk, sp_bulk, h1, h2, m)
            _insert_all(t_seq, sp_seq, h1, h2, m, force_sequential=True)
        assert (t_bulk == t_seq).all()
        assert sp_bulk == sp_seq


def test_spilled_key_reinsert_is_noop():
    """Keys on the spill list count as present: a retried task re-adding a
    previously-spilled key must not duplicate its spill entry (else a later
    delete removes only one copy and the key keeps probing as present)."""
    m = 64
    table = np.zeros((m, SLOTS), dtype=np.uint16)
    spill: list = []
    h1, h2 = _hash_batch(400, seed=7)
    _insert_all(table, spill, h1, h2, m)
    assert spill, "expected displacement pressure to spill"
    snap_t, snap_sp = table.copy(), list(spill)
    _insert_all(table, spill, h1, h2, m)
    assert (table == snap_t).all() and spill == snap_sp
    _insert_all(table, spill, h1, h2, m, force_sequential=True)
    assert (table == snap_t).all() and spill == snap_sp


def test_buckets_must_be_power_of_two():
    """_alt's XOR displacement is only an involution mod 2^k; any other
    bucket count silently relocates evicted fingerprints outside their two
    lookup buckets (false negatives), so the constructor refuses it."""
    with pytest.raises(ValueError, match="power of two"):
        ShardedCuckoo(n_shards=4, buckets_per_shard=100_000)
    ShardedCuckoo(n_shards=4, buckets_per_shard=1 << 10)  # ok


def test_no_false_negatives_even_under_pressure(spark):
    """64 buckets x 4 slots x 8 shards = 2048 slots; 1500 keys loads the
    tables past where displacement chains fail — spillover must keep the
    no-false-negative guarantee."""
    added = sha_df(spark, [f"press-{i}" for i in range(1500)])
    cf = ShardedCuckoo(n_shards=8, buckets_per_shard=64)
    cf.add_df(added)
    assert cf.with_maybe_seen(spark, added).filter(~F.col("maybe_seen")).count() == 0


def test_mostly_rejects_unseen(spark):
    cf = ShardedCuckoo(n_shards=8, buckets_per_shard=1 << 12)
    cf.add_df(sha_df(spark, [f"a{i}" for i in range(1000)]))
    other = sha_df(spark, [f"b{i}" for i in range(1000)])
    fp = cf.with_maybe_seen(spark, other).filter(F.col("maybe_seen")).count()
    assert fp < 20  # 16-bit fingerprints: ~0.01% expected


def test_delete_reopens_keys_keeps_others(spark):
    vals = [f"d{i}" for i in range(600)]
    cf = ShardedCuckoo(n_shards=4, buckets_per_shard=1 << 12)
    cf.add_df(sha_df(spark, vals))
    gone, kept = vals[:300], vals[300:]
    removed = cf.delete_df(sha_df(spark, gone))
    assert removed == 300
    flags = {
        r["url_canon"]: r["maybe_seen"]
        for r in cf.with_maybe_seen(spark, sha_df(spark, vals)).collect()
    }
    assert all(flags[v] for v in kept), "kept keys must still probe True"
    assert not any(flags[v] for v in gone), "deleted keys must probe False"
    # re-adding a deleted key works
    cf.add_df(sha_df(spark, gone[:10]))
    back = cf.with_maybe_seen(spark, sha_df(spark, gone[:10]))
    assert back.filter(~F.col("maybe_seen")).count() == 0


def test_add_is_idempotent(spark):
    df = sha_df(spark, [f"i{i}" for i in range(200)])
    cf = ShardedCuckoo(n_shards=4, buckets_per_shard=1 << 10)
    cf.add_df(df)
    snapshot = {s: (t.copy(), list(sp)) for s, (t, sp) in cf.tables.items()}
    cf.add_df(df)  # re-adds are no-ops (retry safety)
    for s, (t, sp) in cf.tables.items():
        assert (t == snapshot[s][0]).all() and sp == snapshot[s][1]


def test_save_load_roundtrip_and_scheme_guard(spark, tmp_path):
    import json
    import os

    cf = ShardedCuckoo(n_shards=4, buckets_per_shard=1 << 10)
    added = sha_df(spark, [f"x{i}" for i in range(300)])
    cf.add_df(added)
    d = str(tmp_path / "ck")
    cf.save(d)
    cf2 = ShardedCuckoo.load(d, 4, 1 << 10)
    assert cf2.with_maybe_seen(spark, added).filter(~F.col("maybe_seen")).count() == 0
    # sizing mismatch refuses to load
    with pytest.raises(CuckooSchemeMismatch):
        ShardedCuckoo.load(d, 4, 1 << 11)
    meta = json.load(open(os.path.join(d, "_meta.json")))
    meta["scheme"] = 99
    json.dump(meta, open(os.path.join(d, "_meta.json"), "w"))
    with pytest.raises(CuckooSchemeMismatch):
        ShardedCuckoo.load(d, 4, 1 << 10)


def test_file_build_and_partitioned_probe_match_collect(spark, tmp_path):
    added = sha_df(spark, [f"fb-{i}" for i in range(800)])
    probe_set = sha_df(spark, [f"fb-{i}" for i in range(400, 1200)])

    mem = ShardedCuckoo(n_shards=8, buckets_per_shard=1 << 10)
    mem.add_df(added)
    d = str(tmp_path / "ckf")
    fb = ShardedCuckoo(n_shards=8, buckets_per_shard=1 << 10)
    stats = fb.add_df_via_files(added, d)
    assert fb.tables == {}  # nothing driver-resident in file mode
    assert sum(stats.values()) == 800

    a = {
        (r["url_sha1"], r["maybe_seen"])
        for r in mem.with_maybe_seen(spark, probe_set).collect()
    }
    b = {
        (r["url_sha1"], r["maybe_seen"])
        for r in fb.with_maybe_seen_partitioned(spark, probe_set, d).collect()
    }
    assert a == b
    # no false negatives through the file path
    flags = fb.with_maybe_seen_partitioned(spark, added, d)
    assert flags.filter(~F.col("maybe_seen")).count() == 0


def test_dedup_against_seen_with_cuckoo_matches_exact(spark):
    seen_vals = [f"u{i}" for i in range(800)]
    cand_vals = [f"u{i}" for i in range(400, 1200)]
    seen = sha_df(spark, seen_vals)
    cand = sha_df(spark, cand_vals)
    cf = ShardedCuckoo(n_shards=8, buckets_per_shard=1 << 12)
    cf.add_df(seen)
    with_cf = sorted(
        r["url_canon"] for r in dedup_against_seen(spark, cand, seen, cf).collect()
    )
    exact = sorted(
        r["url_canon"] for r in dedup_against_seen(spark, cand, seen, None).collect()
    )
    assert with_cf == exact == sorted(f"u{i}" for i in range(800, 1200))


def test_crawl_with_cuckoo_matches_bloom(spark, tmp_path):
    """seen_filter='cuckoo' produces the identical fetch log and seen set
    as the Bloom crawl (and therefore as no-filter), in both broadcast and
    file-backed probe modes."""
    from data_collector_spark.crawler.driver import CrawlConfig, run_crawl
    from data_collector_spark.crawler.state import CrawlState
    from data_collector_spark.sources.generator import (
        synth_pages,
        synth_politeness,
        synth_robots,
        synth_seeds,
    )

    corpus_dir = str(tmp_path / "ck_corpus")
    synth_pages(spark, 120, n_hosts=4, partitions=2).write.parquet(corpus_dir)
    pages = spark.read.parquet(corpus_dir)

    def go(name, **kw):
        wd = str(tmp_path / name)
        run_crawl(
            spark, wd, pages, synth_seeds(spark, 120, n_hosts=4),
            synth_robots(spark), synth_politeness(spark, 4),
            CrawlConfig(max_rounds=3, bloom_min_seen_rows=0, **kw),
        )
        st = CrawlState(wd)
        seen = sorted(r["url_sha1"] for r in st.read_all(spark, "seen").collect())
        log = sorted(
            (r["round"], r["host"], r["seq_in_host"], r["url_sha1"])
            for r in st.read_all(spark, "fetch_log")
            .filter(F.col("status") == "fetched").collect()
        )
        return seen, log

    ref = go("bloom", seen_filter="bloom")
    assert go("cuckoo", seen_filter="cuckoo") == ref
    assert go("cuckoo_files", seen_filter="cuckoo", bloom_probe_via_files=True) == ref
