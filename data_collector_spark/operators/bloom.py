"""Partition-sharded Bloom filter over the URL-seen set.

The reference gets dedup for free from Postgres PKs
(``ON CONFLICT DO NOTHING``, /root/reference/src/actions/collect/
nyse_events.rs:145-156). At a 10^10-URL frontier the exact seen set is
hundreds of GB, so the anti-join that replaces the PK gets an approximate
*pre*-filter (north_rule): a Bloom filter sharded by sha1-derived key so

- each shard is built executor-side (one ``applyInPandas`` group per
  shard -> one bitmap row), only S tiny bitmap rows reach the driver;
- shards merge incrementally per round (bitwise OR) and persist as .npy
  next to the crawl checkpoint, so resume restores them;
- no false negatives: a candidate missing from the filter is *definitely
  new* and skips the exact anti-join entirely; only maybe-seen candidates
  (true dups + false positives) pay the shuffle against the seen table.

Sizing: bits_per_shard is a constructor knob. Sandbox default 2^22 bits x
16 shards = 8 MiB (fp ~1% at ~4M keys). At 10^10 keys: 256 shards x 2^32
bits = 128 GiB total is infeasible to broadcast whole — there you broadcast
only the shards a partition needs (keys are shard-partitioned first) or
rebuild with more shards; the shard abstraction here is exactly that unit.

Hash scheme (all JVM-side until the bitmap probe): url_sha1 hex ->
h1 = first 15 hex digits, h2 = next 15 (``conv(hex,16,10)``, 60-bit ints),
probe positions (h1 + i*h2) mod m for i<k (Kirsch-Mitzenmacher).
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

_U64 = np.uint64

# Bump whenever the hash->shard/position derivation changes. Probing a
# checkpoint built under another scheme reads the wrong shard's bitmap and
# produces FALSE NEGATIVES (seen URLs re-admitted as new), silently breaking
# the bloom-on == bloom-off invariant — so save() stamps the scheme and
# load() refuses a mismatched (or unstamped, pre-versioning) checkpoint.
SCHEME_VERSION = 2


class BloomSchemeMismatch(RuntimeError):
    """Saved shards were written under a different hash scheme or sizing;
    the caller must rebuild the filter from the exact seen table."""


# Worker-side cache: one entry PER SHARD PATH (not per (path, mtime)) so a
# rewritten shard replaces its old bitmap instead of accumulating a copy
# per round per worker — with worker reuse the old keying leaked one full
# bitmap per shard per round (512 MiB/shard at the 10^10-key sizing).
_SHARD_CACHE: dict[str, tuple[float, np.ndarray]] = {}


def _load_shard(dirpath: str, shard: int):
    """Worker-side shard loader, memoized per path per worker process —
    repeated rounds probing an unchanged shard pay the read once, and a
    rewritten shard (every round ORs new bits in) replaces the cached
    bitmap via its mtime."""
    path = os.path.join(dirpath, f"shard-{shard:04d}.npy")
    if not os.path.exists(path):
        return None
    mtime = os.path.getmtime(path)
    hit = _SHARD_CACHE.get(path)
    if hit is None or hit[0] != mtime:
        hit = (mtime, np.load(path))
        _SHARD_CACHE[path] = hit
    return hit[1]


def dir_has_shards(dirpath: str) -> bool:
    return os.path.isdir(dirpath) and any(
        fn.startswith("shard-") and fn.endswith(".npy") for fn in os.listdir(dirpath)
    )


def add_hash_cols(df: DataFrame, sha_col: str = "url_sha1", n_shards: int = 16) -> DataFrame:
    """h1/h2/shard derived from the sha1 hex, JVM-side (codegen, no UDF).

    The shard id comes from h1's HIGH bits: probe position 0 is
    ``h1 & (m-1)`` (low bits), and with both moduli powers of two a
    low-bit shard would confine every key's first probe to the same
    m/n_shards slot slice per shard — saturating it and costing ~one hash
    function of selectivity. High bits are independent of all probe
    positions' low-bit structure.
    """
    h1 = F.conv(F.substring(sha_col, 1, 15), 16, 10).cast("long")
    h2 = F.conv(F.substring(sha_col, 16, 15), 16, 10).cast("long")
    return (
        df.withColumn("_h1", h1)
        .withColumn("_h2", h2)
        .withColumn(
            "_shard", F.pmod(F.shiftright(F.col("_h1"), 32), F.lit(n_shards)).cast("int")
        )
    )


def _positions(h1: np.ndarray, h2: np.ndarray, k: int, mask: int) -> np.ndarray:
    """(len, k) probe positions; vectorized."""
    h1 = h1.astype(_U64)
    h2 = h2.astype(_U64)
    return np.stack(
        [(h1 + _U64(i) * h2) & _U64(mask) for i in range(k)], axis=1
    )


class ShardedBloom:
    def __init__(self, n_shards: int = 16, bits_per_shard: int = 1 << 22, k: int = 7):
        assert bits_per_shard & (bits_per_shard - 1) == 0, "bits must be power of two"
        self.n_shards = n_shards
        self.m = bits_per_shard
        self.k = k
        self.bitmaps: dict[int, np.ndarray] = {}
        # shards mutated since the last save(): per-round saves rewrite
        # only what changed (a round touches few shards; rewriting every
        # bitmap each round is per-round serial driver cost)
        self._dirty: set[int] = set()

    def _empty(self) -> np.ndarray:
        return np.zeros(self.m // 64, dtype=_U64)

    # ---- build / merge -------------------------------------------------
    def add_df(self, df: DataFrame, sha_col: str = "url_sha1") -> None:
        """Build per-shard delta bitmaps executor-side and OR them in.

        One applyInPandas group per shard -> exactly n_shards rows cross
        to the driver (bitmap bytes), never the keys themselves.
        """
        keyed = add_hash_cols(df.select(sha_col), sha_col, self.n_shards)
        m, k, words = self.m, self.k, self.m // 64

        def build(pdf: pd.DataFrame) -> pd.DataFrame:
            arr = np.zeros(words, dtype=_U64)
            pos = _positions(pdf["_h1"].to_numpy(), pdf["_h2"].to_numpy(), k, m - 1)
            idx = (pos >> 6).ravel()
            bit = (_U64(1) << (pos & _U64(63))).ravel()
            np.bitwise_or.at(arr, idx, bit)
            return pd.DataFrame({"shard": [int(pdf["_shard"].iloc[0])], "bitmap": [arr.tobytes()]})

        rows = (
            keyed.groupBy("_shard")
            .applyInPandas(build, schema="shard int, bitmap binary")
            .collect()
        )
        for r in rows:
            delta = np.frombuffer(r["bitmap"], dtype=_U64)
            if r["shard"] in self.bitmaps:
                self.bitmaps[r["shard"]] = self.bitmaps[r["shard"]] | delta
            else:
                self.bitmaps[r["shard"]] = delta.copy()
            self._dirty.add(r["shard"])

    def add_df_via_files(
        self, df: DataFrame, dirpath: str, sha_col: str = "url_sha1"
    ) -> dict[int, int]:
        """10^10-key build path: each shard's ``applyInPandas`` group ORs
        its delta DIRECTLY into its shard file on shared storage (the
        checkpoint dir here; an object store in production). Only
        (shard_id, row_count) rows reach the driver — never bitmap bytes —
        so the driver's memory stays O(n_shards) metadata while the filter
        itself can be 128 GiB across shards.

        The in-place OR is crash/retry-safe: the file is replaced
        atomically under an exclusive flock (task retries and speculative
        duplicates re-OR the same bits — idempotent), and a crash between
        shard writes leaves extra bits set for an uncommitted round, which
        only costs false positives that the exact anti-join re-checks.

        Returns {shard: rows_added} (driver-side bookkeeping only).
        """
        os.makedirs(dirpath, exist_ok=True)
        self._write_meta(dirpath)
        keyed = add_hash_cols(df.select(sha_col), sha_col, self.n_shards)
        m, k, words = self.m, self.k, self.m // 64

        def build(pdf: pd.DataFrame) -> pd.DataFrame:
            shard = int(pdf["_shard"].iloc[0])
            delta = np.zeros(words, dtype=_U64)
            pos = _positions(pdf["_h1"].to_numpy(), pdf["_h2"].to_numpy(), k, m - 1)
            idx = (pos >> 6).ravel()
            bit = (_U64(1) << (pos & _U64(63))).ravel()
            np.bitwise_or.at(delta, idx, bit)
            path = os.path.join(dirpath, f"shard-{shard:04d}.npy")
            with open(path + ".lock", "w") as lf:
                fcntl.flock(lf, fcntl.LOCK_EX)
                try:
                    if os.path.exists(path):
                        delta |= np.load(path)
                    tmp = path + f".tmp-{os.getpid()}"
                    with open(tmp, "wb") as out:
                        np.save(out, delta)
                    os.replace(tmp, path)
                finally:
                    fcntl.flock(lf, fcntl.LOCK_UN)
            return pd.DataFrame({"shard": [shard], "n_rows": [len(pdf)]})

        rows = (
            keyed.groupBy("_shard")
            .applyInPandas(build, schema="shard int, n_rows long")
            .collect()
        )
        return {r["shard"]: r["n_rows"] for r in rows}

    # ---- probe ---------------------------------------------------------
    def with_maybe_seen(
        self, spark: SparkSession, df: DataFrame, sha_col: str = "url_sha1",
        out_col: str = "maybe_seen",
    ) -> DataFrame:
        """Add bool out_col; False => definitely new (no false negatives)."""
        if not self.bitmaps:
            return df.withColumn(out_col, F.lit(False))
        bc = spark.sparkContext.broadcast({s: b.copy() for s, b in self.bitmaps.items()})
        m, k, n_shards = self.m, self.k, self.n_shards

        @F.pandas_udf(T.BooleanType())
        def probe(h1: pd.Series, h2: pd.Series, shard: pd.Series) -> pd.Series:
            maps = bc.value
            out = np.zeros(len(h1), dtype=bool)
            sh = shard.to_numpy()
            h1v = h1.to_numpy()
            h2v = h2.to_numpy()
            for s in np.unique(sh):
                bm = maps.get(int(s))
                if bm is None:
                    continue
                sel = sh == s
                pos = _positions(h1v[sel], h2v[sel], k, m - 1)
                bits = (bm[pos >> 6] >> (pos & _U64(63))) & _U64(1)
                out[sel] = bits.all(axis=1)
            return pd.Series(out)

        keyed = add_hash_cols(df, sha_col, n_shards)
        return keyed.withColumn(out_col, probe("_h1", "_h2", "_shard")).drop(
            "_h1", "_h2", "_shard"
        )

    def with_maybe_seen_partitioned(
        self,
        spark: SparkSession,
        df: DataFrame,
        dirpath: str,
        sha_col: str = "url_sha1",
        out_col: str = "maybe_seen",
    ) -> DataFrame:
        """Shard-partitioned probe: NO driver broadcast of any bitmap.

        The 10^10-key path: at 256 shards x 2^32 bits the filter is
        128 GiB — unbroadcastable — but each executor only ever needs the
        shards of the keys it holds. Keys shuffle on their shard id (one
        applyInPandas group per shard) and the group's worker loads JUST
        that shard's .npy from shared storage (the checkpoint dir here; an
        object store in production), memoized per worker process. Shuffle
        cost: the candidate keys (which the downstream anti-join shuffles
        anyway); memory cost per task: ONE shard.

        Semantics identical to with_maybe_seen (pytest-pinned).
        """
        m, k, n_shards = self.m, self.k, self.n_shards

        def probe_group(pdf: pd.DataFrame) -> pd.DataFrame:
            shard = int(pdf["_shard"].iloc[0])
            bm = _load_shard(dirpath, shard)
            if bm is None:
                pdf[out_col] = False
                return pdf.drop(columns=["_h1", "_h2", "_shard"])
            pos = _positions(pdf["_h1"].to_numpy(), pdf["_h2"].to_numpy(), k, m - 1)
            bits = (bm[pos >> 6] >> (pos & _U64(63))) & _U64(1)
            pdf[out_col] = bits.all(axis=1)
            return pdf.drop(columns=["_h1", "_h2", "_shard"])

        keyed = add_hash_cols(df, sha_col, n_shards)
        out_schema = ", ".join(
            f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
        ) + f", {out_col} boolean"
        return keyed.groupBy("_shard").applyInPandas(probe_group, schema=out_schema)

    # ---- persistence (resume-from-checkpoint) ---------------------------
    def _meta(self) -> dict:
        return {
            "scheme": SCHEME_VERSION,
            "n_shards": self.n_shards,
            "m": self.m,
            "k": self.k,
        }

    def _write_meta(self, dirpath: str) -> None:
        path = os.path.join(dirpath, "_meta.json")
        if os.path.exists(path):
            with open(path) as f:
                if json.load(f) == self._meta():
                    return  # current; a DIFFERENT meta (e.g. a stale
                    # other-kind marker after a filter switch) is replaced
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self._meta(), f)
        os.replace(tmp, path)

    def save(self, dirpath: str) -> None:
        os.makedirs(dirpath, exist_ok=True)
        self._write_meta(dirpath)
        for s, b in self.bitmaps.items():
            path = os.path.join(dirpath, f"shard-{s:04d}.npy")
            # rewrite only shards dirtied since the last save; the
            # existence check keeps a save into a FRESH dir complete
            if s in self._dirty or not os.path.exists(path):
                np.save(path, b)
        self._dirty.clear()

    def dir_has_shards(self, dirpath: str) -> bool:
        return dir_has_shards(dirpath)

    @classmethod
    def load(
        cls,
        dirpath: str,
        n_shards: int = 16,
        bits_per_shard: int = 1 << 22,
        k: int = 7,
        load_bitmaps: bool = True,
    ) -> "ShardedBloom":
        """Restore from a checkpoint dir, verifying the hash scheme.

        Shards present without a matching ``_meta.json`` (other scheme
        version, other sizing, or a pre-versioning checkpoint) raise
        ``BloomSchemeMismatch`` — probing them would yield false negatives.
        ``load_bitmaps=False`` validates the meta but keeps the driver free
        of bitmap bytes (the file-backed build/probe mode).
        """
        bf = cls(n_shards, bits_per_shard, k)
        if not dir_has_shards(dirpath):
            return bf
        meta_path = os.path.join(dirpath, "_meta.json")
        if not os.path.exists(meta_path):
            raise BloomSchemeMismatch(
                f"{dirpath}: shard files without a scheme marker "
                "(pre-versioning checkpoint) — rebuild from the seen table"
            )
        with open(meta_path) as f:
            meta = json.load(f)
        if meta != bf._meta():
            raise BloomSchemeMismatch(
                f"{dirpath}: saved {meta} != configured {bf._meta()} — "
                "rebuild from the seen table"
            )
        if load_bitmaps:
            for fn in os.listdir(dirpath):
                if fn.startswith("shard-") and fn.endswith(".npy"):
                    bf.bitmaps[int(fn[6:10])] = np.load(os.path.join(dirpath, fn))
        return bf
