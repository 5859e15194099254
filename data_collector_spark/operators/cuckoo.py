"""Partition-sharded cuckoo filter over the URL-seen set.

The north rule names a "Bloom/cuckoo URL-seen set"; ``ShardedBloom``
covers the append-only path, this covers the same contract PLUS deletion
(`delete_df`), which a Bloom cannot express — the operational need is
purge workflows (takedowns, robots-revoked hosts, forget-and-recrawl):
remove a key and the dedup gate admits it again, with no rebuild.

Same scale shape as the Bloom (operators/bloom.py): keys shard on the
sha1-derived high bits, each shard is one numpy table built/probed by one
``applyInPandas`` group, shards persist as .npy next to the checkpoint
with a scheme-version meta, and the file-backed mode keeps the driver
free of table bytes. The interface duck-types ``ShardedBloom`` exactly
(``add_df`` / ``with_maybe_seen[_partitioned]`` / ``add_df_via_files`` /
``save`` / ``load`` / ``bitmaps``), so ``dedup_against_seen`` and the
crawl loop take either filter unchanged (``CrawlConfig.seen_filter``).

Cuckoo mechanics (Fan et al., CoNLL'14, public): 16-bit fingerprints, 4
slots/bucket, partial-key displacement — bucket i1 = h mod m, i2 = i1 XOR
(fp * 0x5bd1e995 mod m). Eviction is DETERMINISTIC (victim slot =
(kick + fp) mod 4, path from i1) so builds are replayable; keys whose
displacement chain exceeds MAX_KICKS go to a per-shard exact spillover
list, preserving the no-false-negatives guarantee at any load factor.
"""

from __future__ import annotations

import fcntl
import json
import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_collector_spark.operators.bloom import add_hash_cols

SCHEME_VERSION = 1
MAX_KICKS = 250
SLOTS = 4
_MIX = np.uint64(0x5BD1E995)


class CuckooSchemeMismatch(RuntimeError):
    pass


def _fp(h2: np.ndarray) -> np.ndarray:
    """16-bit nonzero fingerprint from h2 (0 marks an empty slot)."""
    fp = (h2.astype(np.uint64) & np.uint64(0xFFFF)).astype(np.uint16)
    fp[fp == 0] = 1
    return fp


def _i1(h1: np.ndarray, m: int) -> np.ndarray:
    return (h1.astype(np.uint64) % np.uint64(m)).astype(np.int64)


def _alt(i: np.ndarray, fp: np.ndarray, m: int) -> np.ndarray:
    return (
        (i.astype(np.uint64) ^ (fp.astype(np.uint64) * _MIX)) % np.uint64(m)
    ).astype(np.int64)


def _insert_all(
    table: np.ndarray, spill: list, h1, h2, m: int,
    force_sequential: bool = False,
) -> None:
    """Deterministic cuckoo insert of a key batch into one shard table
    (shape (m, SLOTS) uint16). Duplicate fingerprints at either of a key's
    two buckets are not re-inserted (idempotent re-adds), INCLUDING keys
    previously pushed to the spill list (so task retries of spilled keys
    stay no-ops).

    Fast path (byte-identical to the sequential build by construction,
    pinned by test_cuckoo.py): the batch runs in windows of
    ``_BULK_WINDOW`` keys; each window drops already-present keys with one
    vectorized probe against the LIVE table, then walks the remainder once
    in order, alternating vectorized segment placement with exact per-key
    steps for conflicted keys (see ``_bulk_window``). A density gate hands
    windows past ~20% table load straight to the sequential loop, where
    per-key stepping is cheaper than segment bookkeeping. Measured build
    rates, one core, 64k-bucket shard: ~0.3-1.6M keys/s below 20% load
    (4-15x the sequential loop's ~100-120k/s), sequential-speed beyond,
    and ~9M keys/s for idempotent re-adds of present keys (the task-retry
    case — pure vectorized probe). Size ``buckets_per_shard`` so the
    steady-state load stays low; the false-positive rate wants the same.
    """
    n = len(h1)
    if n == 0:
        return
    h1 = np.asarray(h1, dtype=np.uint64)
    h2 = np.asarray(h2, dtype=np.uint64)
    fps = _fp(h2)
    i1s = _i1(h1, m)
    i2s = _alt(i1s, fps, m)
    spl = {(int(b), int(f)) for b, f in spill}

    if force_sequential or n < 128:
        _seq_run(table, spill, spl, fps, i1s, i2s, range(n), m)
        return
    for lo in range(0, n, _BULK_WINDOW):
        hi = min(lo + _BULK_WINDOW, n)
        _bulk_window(
            table, spill, spl,
            fps[lo:hi], i1s[lo:hi], i2s[lo:hi], m,
        )


_BULK_WINDOW = 4096


def _bulk_window(
    table: np.ndarray, spill: list, spl: set, fps, i1s, i2s, m: int
) -> None:
    """One pass over a window, byte-identical to sequential processing.

    Pre-pass (vectorized): presence vs the live table + spill, and the
    window-global "hard" flags — in-window (i1, fp) duplicates and
    cross-bucket fingerprint twins — the only cases where one window key's
    placement can make a LATER key's presence flip. Then a single ordered
    walk alternates (a) vectorized bulk placement of maximal segments
    whose keys provably land at their i1 bucket (live per-segment fit
    check: within-segment occurrence index < live empty-slot count) and
    (b) exact per-key steps for conflicted keys. Per-key steps can write
    into arbitrary buckets (i2 fallback, kick chains), so every bucket
    they touch goes into ``touched`` and later keys whose buckets
    intersect it are forced onto the per-key path (live checks) instead of
    trusting pre-pass state."""
    n = len(fps)
    idxs = np.arange(n)
    present = (table[i1s] == fps[:, None]).any(axis=1) | (
        table[i2s] == fps[:, None]
    ).any(axis=1)
    if spl:
        for k in np.nonzero(~present)[0]:
            if (int(i1s[k]), int(fps[k])) in spl or (
                int(i2s[k]), int(fps[k])
            ) in spl:
                present[k] = True
    rem = idxs[~present]
    rn = rem.size
    if rn == 0:
        return
    if rn < 128:
        _seq_run(table, spill, spl, fps, i1s, i2s, rem, m)
        return
    r1, r2, rf = i1s[rem], i2s[rem], fps[rem]
    # conflict-density gate: keys whose i1 bucket is already full each cost
    # a per-key step AND shrink the vectorizable segments around them; past
    # ~0.2% of the window (table load ~20%) the segment bookkeeping costs
    # more than the per-key loop it replaces, so run the remainder
    # sequentially (the vectorized presence pass above already paid off)
    if float(((table[r1] != 0).all(axis=1)).mean()) > 0.002:
        _seq_run(table, spill, spl, fps, i1s, i2s, rem, m)
        return
    comb1 = (r1.astype(np.uint64) << np.uint64(16)) | rf.astype(np.uint64)
    _, first_ix = np.unique(comb1, return_index=True)
    hard = np.ones(rn, dtype=bool)
    hard[first_ix] = False  # later copies of an in-window (i1, fp) pair
    comb2 = (r2.astype(np.uint64) << np.uint64(16)) | rf.astype(np.uint64)
    hard |= np.isin(comb2, comb1) & (r2 != r1)  # cross-bucket twins
    hard_pos = np.nonzero(hard)[0]

    touched: list = []
    tarr: np.ndarray | None = None
    occ = None
    j = 0
    while j < rn:
        hp = hard_pos[np.searchsorted(hard_pos, j):]
        nb = int(hp[0]) if hp.size else rn
        if nb > j and touched:
            if tarr is None or tarr.size != len(touched):
                tarr = np.array(touched, dtype=np.int64)
            blk = np.isin(r1[j:nb], tarr) | np.isin(r2[j:nb], tarr)
            bp = np.nonzero(blk)[0]
            if bp.size:
                nb = j + int(bp[0])
        if nb > j:
            s1 = r1[j:nb]
            w = nb - j
            sort_ix = np.argsort(s1, kind="stable")
            sb = s1[sort_ix]
            gs = np.concatenate(([0], np.nonzero(np.diff(sb))[0] + 1))
            gl = np.diff(np.concatenate((gs, [w])))
            occ = np.empty(w, dtype=np.int64)
            occ[sort_ix] = np.arange(w) - np.repeat(gs, gl)
            fits = occ < (table[s1] == 0).sum(axis=1)
            bad_fit = np.nonzero(~fits)[0]
            if bad_fit.size:
                nb = j + int(bad_fit[0])
        if nb > j:
            w = nb - j
            p1, pf, po = r1[j:nb], rf[j:nb], occ[:w]
            # slot for key k = its occ-th empty slot of bucket p1[k]:
            # argsort(occupied) lists empty slot indices first, ascending
            empty_order = np.argsort(table[p1] != 0, axis=1, kind="stable")
            slots = empty_order[np.arange(w), po]
            table[p1, slots] = pf
            j = nb
        else:
            k = int(rem[j])
            fp, i1, i2 = int(fps[k]), int(i1s[k]), int(i2s[k])
            if (
                not (table[i1] == fp).any()
                and not (table[i2] == fp).any()
                and (i1, fp) not in spl
                and (i2, fp) not in spl
            ):
                _place_one(table, spill, spl, fp, i1, i2, m, touched)
            j += 1


def _place_one(
    table: np.ndarray, spill: list, spl: set, fp: int, i1: int, i2: int,
    m: int, touched: list | None = None,
) -> None:
    """Exact per-key placement (presence already ruled out by the caller):
    first empty slot at i1 then i2, else the deterministic kick chain,
    else the exact spillover list. Every bucket written (and, on spill,
    both buckets of the spilled fingerprint) is appended to ``touched`` so
    the bulk path knows its pre-pass view of those buckets is stale."""
    for b in (i1, i2):
        empties = np.nonzero(table[b] == 0)[0]
        if len(empties):
            table[b, empties[0]] = fp
            if touched is not None:
                touched.append(b)
            return
    cur_fp, cur_b = fp, i1
    mix = int(_MIX)
    for kick in range(MAX_KICKS):
        slot = (kick + cur_fp) % SLOTS
        victim = int(table[cur_b, slot])
        table[cur_b, slot] = cur_fp
        if touched is not None:
            touched.append(cur_b)
        cur_fp = victim
        cur_b = (cur_b ^ (cur_fp * mix)) % m
        empties = np.nonzero(table[cur_b] == 0)[0]
        if len(empties):
            table[cur_b, empties[0]] = cur_fp
            if touched is not None:
                touched.append(cur_b)
            return
    spill.append((cur_b, cur_fp))  # exact spillover: never lost
    spl.add((cur_b, cur_fp))
    if touched is not None:
        touched.append(cur_b)
        touched.append((cur_b ^ (cur_fp * mix)) % m)


def _seq_run(
    table: np.ndarray, spill: list, spl: set, fps, i1s, i2s, order, m: int
) -> None:
    """Reference sequential path over ``order`` (original-order positions),
    presence-checking each key against the live table + spill."""
    for k in order.tolist() if hasattr(order, "tolist") else order:
        fp, i1, i2 = int(fps[k]), int(i1s[k]), int(i2s[k])
        if (table[i1] == fp).any() or (table[i2] == fp).any():
            continue  # already present (or an indistinguishable twin)
        if (i1, fp) in spl or (i2, fp) in spl:
            continue  # previously spilled — re-insert is a no-op
        _place_one(table, spill, spl, fp, i1, i2, m)


def _contains(table: np.ndarray, spill: np.ndarray, h1, h2, m: int) -> np.ndarray:
    fps = _fp(h2)
    i1s = _i1(h1, m)
    i2s = _alt(i1s, fps, m)
    hit = (table[i1s] == fps[:, None]).any(axis=1) | (
        table[i2s] == fps[:, None]
    ).any(axis=1)
    if spill.size:
        sp = {(int(b), int(f)) for b, f in spill}
        for k in np.nonzero(~hit)[0]:
            if (int(i1s[k]), int(fps[k])) in sp or (int(i2s[k]), int(fps[k])) in sp:
                hit[k] = True
    return hit


def _delete_all(table: np.ndarray, spill: list, h1, h2, m: int) -> int:
    """Remove ONE copy of each key's fingerprint (i1, i2, then spillover).
    Returns how many were found+removed."""
    fps = _fp(h2)
    i1s = _i1(h1, m)
    removed = 0
    for k in range(len(fps)):
        fp, i1 = int(fps[k]), int(i1s[k])
        i2 = int(_alt(np.array([i1]), np.array([fp]), m)[0])
        done = False
        for b in (i1, i2):
            slots = np.nonzero(table[b] == fp)[0]
            if len(slots):
                table[b, slots[0]] = 0
                removed += 1
                done = True
                break
        if done:
            continue
        for idx, (b, f) in enumerate(spill):
            if f == fp and b in (i1, i2):
                spill.pop(idx)
                removed += 1
                break
    return removed


class ShardedCuckoo:
    """Duck-types ShardedBloom; ``bitmaps`` maps shard -> packed state."""

    def __init__(self, n_shards: int = 16, buckets_per_shard: int = 1 << 16):
        if buckets_per_shard <= 0 or buckets_per_shard & (buckets_per_shard - 1):
            raise ValueError(
                f"buckets_per_shard must be a power of two, got "
                f"{buckets_per_shard}: _alt's XOR displacement is an "
                "involution (alt(alt(i))==i) only mod 2^k — any other "
                "modulus relocates evicted fingerprints outside their "
                "key's two lookup buckets (silent false negatives)"
            )
        self.n_shards = n_shards
        self.m = buckets_per_shard
        # shard -> (table (m, SLOTS) uint16, spill list[(bucket, fp)])
        self.tables: dict[int, tuple[np.ndarray, list]] = {}

    @property
    def bitmaps(self) -> dict:
        """Non-empty iff the filter holds anything (the gate seen.py uses)."""
        return self.tables

    def _shard_state(self, s: int):
        if s not in self.tables:
            self.tables[s] = (np.zeros((self.m, SLOTS), dtype=np.uint16), [])
        return self.tables[s]

    # ---- build / delete (collect mode) ---------------------------------
    def _apply_batches(self, df: DataFrame, sha_col: str, op) -> int:
        keyed = add_hash_cols(df.select(sha_col), sha_col, self.n_shards)
        rows = keyed.select("_shard", "_h1", "_h2").collect()
        by_shard: dict[int, list] = {}
        for r in rows:
            by_shard.setdefault(r["_shard"], []).append((r["_h1"], r["_h2"]))
        n = 0
        for s, pairs in sorted(by_shard.items()):
            h1 = np.array([p[0] for p in pairs], dtype=np.uint64)
            h2 = np.array([p[1] for p in pairs], dtype=np.uint64)
            table, spill = self._shard_state(s)
            n += op(table, spill, h1, h2) or 0
        return n

    def add_df(self, df: DataFrame, sha_col: str = "url_sha1") -> None:
        """NOTE: collect-mode build pulls the KEY HASHES (16 B/key) to the
        driver — fine at test/resume sizes; the crawl loop uses
        ``add_df_via_files`` beyond that (like the Bloom's file mode)."""
        self._apply_batches(
            df, sha_col, lambda t, sp, h1, h2: _insert_all(t, sp, h1, h2, self.m)
        )

    def delete_df(self, df: DataFrame, sha_col: str = "url_sha1") -> int:
        """Remove keys (purge / forget-and-recrawl). Returns #removed.
        Deleting a never-inserted key can remove an indistinguishable
        twin's fingerprint — standard cuckoo caveat; only delete keys the
        exact seen table confirms."""
        return self._apply_batches(
            df, sha_col, lambda t, sp, h1, h2: _delete_all(t, sp, h1, h2, self.m)
        )

    # ---- probe ---------------------------------------------------------
    def with_maybe_seen(
        self, spark: SparkSession, df: DataFrame, sha_col: str = "url_sha1",
        out_col: str = "maybe_seen",
    ) -> DataFrame:
        if not self.tables:
            return df.withColumn(out_col, F.lit(False))
        packed = {
            s: (t.copy(), np.array(sp, dtype=np.int64).reshape(-1, 2))
            for s, (t, sp) in self.tables.items()
        }
        bc = spark.sparkContext.broadcast(packed)
        m, n_shards = self.m, self.n_shards

        @F.pandas_udf(T.BooleanType())
        def probe(h1: pd.Series, h2: pd.Series, shard: pd.Series) -> pd.Series:
            maps = bc.value
            out = np.zeros(len(h1), dtype=bool)
            sh = shard.to_numpy()
            h1v = h1.to_numpy(dtype=np.uint64)
            h2v = h2.to_numpy(dtype=np.uint64)
            for s in np.unique(sh):
                if int(s) not in maps:
                    continue
                table, spill = maps[int(s)]
                sel = sh == s
                out[sel] = _contains(table, spill, h1v[sel], h2v[sel], m)
            return pd.Series(out)

        keyed = add_hash_cols(df, sha_col, n_shards)
        return keyed.withColumn(out_col, probe("_h1", "_h2", "_shard")).drop(
            "_h1", "_h2", "_shard"
        )

    def with_maybe_seen_partitioned(
        self, spark: SparkSession, df: DataFrame, dirpath: str,
        sha_col: str = "url_sha1", out_col: str = "maybe_seen",
    ) -> DataFrame:
        """Shard-partitioned probe from files — no driver broadcast."""
        m, n_shards = self.m, self.n_shards

        def probe_group(pdf: pd.DataFrame) -> pd.DataFrame:
            shard = int(pdf["_shard"].iloc[0])
            state = _load_shard(dirpath, shard)
            if state is None:
                pdf[out_col] = False
            else:
                table, spill = state
                pdf[out_col] = _contains(
                    table, spill,
                    pdf["_h1"].to_numpy(dtype=np.uint64),
                    pdf["_h2"].to_numpy(dtype=np.uint64), m,
                )
            return pdf.drop(columns=["_h1", "_h2", "_shard"])

        keyed = add_hash_cols(df, sha_col, n_shards)
        out_schema = ", ".join(
            f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
        ) + f", {out_col} boolean"
        return keyed.groupBy("_shard").applyInPandas(probe_group, schema=out_schema)

    # ---- executor-side build -------------------------------------------
    def add_df_via_files(
        self, df: DataFrame, dirpath: str, sha_col: str = "url_sha1"
    ) -> dict[int, int]:
        """Each shard group inserts into its own shard file under flock
        (atomic replace); only (shard, rows) reach the driver. Duplicate
        re-inserts are no-ops, so task retries are safe."""
        os.makedirs(dirpath, exist_ok=True)
        self._write_meta(dirpath)
        m = self.m

        def build(pdf: pd.DataFrame) -> pd.DataFrame:
            shard = int(pdf["_shard"].iloc[0])
            path = os.path.join(dirpath, f"cuckoo-{shard:04d}.npz")
            with open(path + ".lock", "w") as lf:
                fcntl.flock(lf, fcntl.LOCK_EX)
                try:
                    if os.path.exists(path):
                        with np.load(path) as z:
                            table = z["table"].copy()
                            spill = [tuple(x) for x in z["spill"]]
                    else:
                        table = np.zeros((m, SLOTS), dtype=np.uint16)
                        spill = []
                    _insert_all(
                        table, spill,
                        pdf["_h1"].to_numpy(dtype=np.uint64),
                        pdf["_h2"].to_numpy(dtype=np.uint64), m,
                    )
                    tmp = path + f".tmp-{os.getpid()}"
                    with open(tmp, "wb") as out:
                        np.savez(
                            out, table=table,
                            spill=np.array(spill, dtype=np.int64).reshape(-1, 2),
                        )
                    os.replace(tmp, path)
                finally:
                    fcntl.flock(lf, fcntl.LOCK_UN)
            return pd.DataFrame({"shard": [shard], "n_rows": [len(pdf)]})

        keyed = add_hash_cols(df.select(sha_col), sha_col, self.n_shards)
        rows = (
            keyed.groupBy("_shard")
            .applyInPandas(build, schema="shard int, n_rows long")
            .collect()
        )
        return {r["shard"]: r["n_rows"] for r in rows}

    # ---- persistence ----------------------------------------------------
    def _meta(self) -> dict:
        return {
            "kind": "cuckoo",
            "scheme": SCHEME_VERSION,
            "n_shards": self.n_shards,
            "m": self.m,
            "slots": SLOTS,
        }

    def _write_meta(self, dirpath: str) -> None:
        path = os.path.join(dirpath, "_meta.json")
        if os.path.exists(path):
            with open(path) as f:
                if json.load(f) == self._meta():
                    return  # replace a stale other-kind/-scheme marker
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self._meta(), f)
        os.replace(tmp, path)

    def save(self, dirpath: str) -> None:
        os.makedirs(dirpath, exist_ok=True)
        self._write_meta(dirpath)
        for s, (table, spill) in self.tables.items():
            np.savez(
                os.path.join(dirpath, f"cuckoo-{s:04d}.npz"),
                table=table,
                spill=np.array(spill, dtype=np.int64).reshape(-1, 2),
            )

    @classmethod
    def load(
        cls, dirpath: str, n_shards: int = 16, buckets_per_shard: int = 1 << 16,
        load_bitmaps: bool = True,
    ) -> "ShardedCuckoo":
        cf = cls(n_shards, buckets_per_shard)
        if not dir_has_shards(dirpath):
            return cf
        meta_path = os.path.join(dirpath, "_meta.json")
        if not os.path.exists(meta_path):
            raise CuckooSchemeMismatch(f"{dirpath}: shards without scheme marker")
        with open(meta_path) as f:
            meta = json.load(f)
        if meta != cf._meta():
            raise CuckooSchemeMismatch(
                f"{dirpath}: saved {meta} != configured {cf._meta()}"
            )
        if load_bitmaps:
            for fn in os.listdir(dirpath):
                if fn.startswith("cuckoo-") and fn.endswith(".npz"):
                    with np.load(os.path.join(dirpath, fn)) as z:
                        cf.tables[int(fn[7:11])] = (
                            z["table"].copy(),
                            [tuple(x) for x in z["spill"]],
                        )
        return cf

    def dir_has_shards(self, dirpath: str) -> bool:
        return dir_has_shards(dirpath)


def dir_has_shards(dirpath: str) -> bool:
    return os.path.isdir(dirpath) and any(
        fn.startswith("cuckoo-") and fn.endswith(".npz") for fn in os.listdir(dirpath)
    )


# worker-side cache, one entry per shard path (same policy as bloom.py)
_SHARD_CACHE: dict[str, tuple[float, tuple]] = {}


def _load_shard(dirpath: str, shard: int):
    path = os.path.join(dirpath, f"cuckoo-{shard:04d}.npz")
    if not os.path.exists(path):
        return None
    mtime = os.path.getmtime(path)
    hit = _SHARD_CACHE.get(path)
    if hit is None or hit[0] != mtime:
        with np.load(path) as z:
            hit = (mtime, (z["table"].copy(), z["spill"].copy()))
        _SHARD_CACHE[path] = hit
    return hit[1]
