#!/usr/bin/env python3
"""Two-cluster-size scaling evidence (BASELINE.json north_rule).

No real cluster exists in this sandbox, so the same crawl job runs at two
local parallelism levels (default local[2] vs local[8] — N and 4N cores)
over the SAME pre-generated corpus; reported: throughput at both +
efficiency = (throughput_4N / throughput_N) / 4, target >= 0.8.

Methodology notes (both matter for honest numbers):
- CPU affinity: ``local[N]`` only caps Spark task slots — the JVM's
  scan/serde/GC threads and the Python UDF workers run on top of them
  (measured: a local[2] crawl burns ~3.5 cores). Each level therefore
  runs under ``taskset -c 0..N-1``, which bounds the whole process tree
  to N cores exactly as an N-core cluster node would.
- N=2 vs 4N=8 (not 8 vs 32): raw multiprocessing calibration on this box
  scales linearly through 8 workers but only ~2.3x from 8->32 (SMT);
  2-vs-8 measures the engine, not the hardware's hyperthread falloff.
- one-time setup (corpus generation, seed canonicalization / round-0
  state init) runs before the timed window, like cluster provisioning.
- corpus and crawl state live on tmpfs (/dev/shm) and each level runs
  ``--repeats`` times taking the best, so disk-writeback variance (the
  sandbox's /tmp is a single virtio disk) doesn't masquerade as
  (anti-)scaling.

Each level runs in its own subprocess (a JVM can't change master). The
corpus is generated once (deterministic, partition-independent) and read
from parquet by both runs.

Usage: python scripts/bench_scaling.py [--n-urls 600000] [--cfg JSON]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRATCH = os.environ.get(
    "DCS_BENCH_SCRATCH", "/dev/shm" if os.path.isdir("/dev/shm") else None
)

RUN_TEMPLATE = r"""
import json, shutil, sys, tempfile, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from data_collector_spark.session import get_spark
from data_collector_spark.crawler.driver import CrawlConfig, run_crawl
from data_collector_spark.sources.generator import synth_pages

cores = {cores}
extra = {{}}
if {local_cluster!r}:
    import os
    os.environ["SPARK_GRAFT_MASTER"] = f"local-cluster[{{cores}},1,4096]"
    extra["spark.executorEnv.PYTHONPATH"] = {repo!r}
sp_mult = {shuffle_mult!r}
spark = get_spark("dcs-scaling", cores=cores,
                  shuffle_partitions=(sp_mult * cores if sp_mult else None),
                  extra_conf=extra)
pages = spark.read.parquet({corpus!r})
seeds = (pages.select(F.col("url_canon").alias("url")).orderBy("url")
         .limit({seeds}).withColumn("priority", F.lit(0)))
robots = spark.createDataFrame([], "host string, path_prefix string")
budgets = spark.createDataFrame([("", {budget})], "host string, budget_per_round int")
wd = {workdir!r}
shutil.rmtree(wd, ignore_errors=True)

# untimed: JIT/python-worker warmup on a throwaway crawl (cluster analog:
# long-running executors — the first job in a fresh JVM is 1.5-2.5x slower,
# a constant cost that would tax the faster level's ratio, not the engine)
wwd = tempfile.mkdtemp(prefix="dcs_warm_")
wpages = synth_pages(spark, 4000, n_hosts=20, links_per_page=4, partitions=2 * cores)
wseeds = (wpages.select(F.col("url_canon").alias("url")).orderBy("url")
          .limit(1000).withColumn("priority", F.lit(0)))
run_crawl(spark, wwd, wpages, wseeds, robots,
          spark.createDataFrame([("", 100)], "host string, budget_per_round int"),
          CrawlConfig(max_rounds=1, default_budget=100))
shutil.rmtree(wwd, ignore_errors=True)

# untimed: one-time state init (seed canonicalization, bloom bootstrap)
run_crawl(spark, wd, pages, seeds, robots, budgets,
          CrawlConfig(max_rounds=0, default_budget={budget}))

t0 = time.monotonic()
ms = run_crawl(spark, wd, pages, seeds, robots, budgets,
               CrawlConfig(max_rounds={rounds}, default_budget={budget},
                           **{cfg_extra!r}))
wall = time.monotonic() - t0
fetched = sum(m.fetched for m in ms)
deduped = sum(m.deduped for m in ms)
enqueued = sum(m.enqueued for m in ms)
processed = fetched + deduped + enqueued
shutil.rmtree(wd, ignore_errors=True)  # tmpfs scratch
print("RESULT " + json.dumps({{
    "cores": cores, "wall_sec": round(wall, 2), "fetched": fetched,
    "deduped": deduped, "enqueued": enqueued,
    "urls_per_sec": round(processed / wall, 1),
    "rounds": [m.as_dict() for m in ms],
}}))
"""


CALIB_TEMPLATE = r"""
import sys, time
import multiprocessing as mp
sys.path.insert(0, {repo!r})
import pandas as pd
from data_collector_spark.functions.extract import extract_text_series, extract_links_series

def make_batch(n=2000, words=1000, seed=1):
    import random
    rng = random.Random(seed)
    pages = []
    for i in range(n):
        body = " ".join("w" + str(rng.randrange(5000)) for _ in range(words))
        links = "".join('<a href="/p/' + str(rng.randrange(99999)) + '">x</a>' for _ in range(8))
        pages.append(("<html><head><script>var x=1;</script></head><body><p>"
                      + body + "</p>" + links + "</body></html>").encode())
    return pd.Series(pages)

def work(args):
    batch, reps = args
    for _ in range(reps):
        extract_text_series(batch)
        extract_links_series(batch, pd.Series(["http://h.test/x"] * len(batch)))
    return len(batch) * reps

if __name__ == "__main__":
    nproc = {cores}
    batches = [make_batch(seed=i) for i in range(16)]
    work((batches[0], 1))  # warmup
    with mp.Pool(nproc) as p:
        t0 = time.monotonic()
        tot = sum(p.map(work, [(b, 2) for b in batches]))
        print("CALIB", tot / (time.monotonic() - t0))
"""


SHUFFLE_CALIB_TEMPLATE = r"""
import sys, time
sys.path.insert(0, {repo!r})
from data_collector_spark.session import get_spark
from pyspark.sql import functions as F
spark = get_spark("dcs-shuffle-calib", cores={cores})
# warmup (JIT + shuffle service)
spark.range(0, 2_000_000, 1, {cores} * 2).groupBy((F.col("id") % 1000).alias("k")).count().count()
n = 60_000_000
t0 = time.monotonic()
# two chained shuffles over string keys — the workload class of the
# engine's frontier phase (hash, exchange, sort/agg), no Python anywhere
df = (spark.range(0, n, 1, {cores} * 2)
      .withColumn("k", F.sha1(F.col("id").cast("string")))
      .groupBy(F.substring("k", 1, 6).alias("k6")).agg(F.count("*").alias("c"))
      .groupBy(F.substring("k6", 1, 3).alias("k3")).agg(F.sum("c").alias("c")))
rows = df.count()
print("SHUFCALIB", n / (time.monotonic() - t0))
"""


def run_shuffle_calibration(cores: int) -> float:
    """JVM shuffle-kernel throughput at `cores` pinned cores: the ceiling
    for the engine's shuffle-bound phases (frontier dedup/anti-join). The
    pandas extract kernel measures the memory-bus ceiling of UDF work;
    shuffle work (hash, exchange write/read, sort-agg) has its OWN
    hardware ceiling on this box — pairing each phase with its own
    workload-class kernel is what makes the per-phase attribution
    interpretable."""
    cpus = ",".join(str(i) for i in range(cores))
    out = subprocess.run(
        ["taskset", "-c", cpus, sys.executable, "-c",
         SHUFFLE_CALIB_TEMPLATE.format(repo=REPO, cores=cores)],
        capture_output=True, text=True, check=True, cwd=REPO,
    )
    for line in out.stdout.splitlines():
        if line.startswith("SHUFCALIB "):
            return float(line.split()[1])
    raise RuntimeError(f"no SHUFCALIB line: {out.stdout[-500:]}")


def run_calibration(cores: int) -> float:
    """Raw-hardware throughput of the actual extract kernel under pure
    multiprocessing (no Spark, no JVM) at `cores` pinned cores — the
    ceiling any engine can reach on this box for this workload class
    (pandas regex/string work saturates memory bandwidth well before the
    core count: measured ~0.76 for 2->8 on this box, i.e. even perfect
    engines can't show 0.8 raw here)."""
    cpus = ",".join(str(i) for i in range(cores))
    out = subprocess.run(
        ["taskset", "-c", cpus, sys.executable, "-c",
         CALIB_TEMPLATE.format(repo=REPO, cores=cores)],
        capture_output=True, text=True, check=True, cwd=REPO,
    )
    for line in out.stdout.splitlines():
        if line.startswith("CALIB "):
            return float(line.split()[1])
    raise RuntimeError(f"no CALIB line: {out.stdout[-500:]}")


def run_level(
    cores: int, corpus: str, budget: int, rounds: int, seeds: int,
    repeats: int = 2, local_cluster: bool = False,
    cfg_extra: dict | None = None, shuffle_mult: int | None = None,
) -> dict:
    best = None
    for _ in range(repeats):
        code = RUN_TEMPLATE.format(
            repo=REPO, cores=cores, corpus=corpus, budget=budget, rounds=rounds,
            seeds=seeds, local_cluster=local_cluster, cfg_extra=cfg_extra or {},
            shuffle_mult=shuffle_mult,
            workdir=tempfile.mkdtemp(prefix=f"dcs_scale_{cores}_", dir=SCRATCH),
        )
        # local-cluster = N single-core executor JVMs (the driver gets a
        # constant extra 2-core allotment, like a separate driver node)
        n_pin = cores + 2 if local_cluster else cores
        cpus = ",".join(str(i) for i in range(n_pin))
        env = dict(os.environ, SPARK_HOME=os.environ.get("SPARK_HOME", "/opt/spark"))
        out = subprocess.run(
            ["taskset", "-c", cpus, sys.executable, "-c", code],
            capture_output=True, text=True, check=True, cwd=REPO, env=env,
        )
        res = None
        for line in out.stdout.splitlines():
            if line.startswith("RESULT "):
                res = json.loads(line[len("RESULT "):])
        if res is None:
            raise RuntimeError(f"no RESULT line; stderr tail: {out.stderr[-2000:]}")
        if best is None or res["urls_per_sec"] > best["urls_per_sec"]:
            best = res
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-urls", type=int, default=600_000)
    ap.add_argument("--n-hosts", type=int, default=3000)
    ap.add_argument("--budget", type=int, default=120)
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--seeds", type=int, default=200_000)
    # default N=2 vs 4N=8: raw-CPU calibration on this box shows linear
    # scaling 1..8 workers but only ~2.3x from 8->32 (SMT) — the 2-vs-8
    # pair measures the ENGINE's scaling, not the hardware's SMT falloff
    ap.add_argument("--cores-a", type=int, default=2)
    ap.add_argument("--cores-b", type=int, default=8)
    ap.add_argument("--min-words", type=int, default=120)
    ap.add_argument("--max-words", type=int, default=320)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--mode", choices=["local", "local-cluster"], default="local",
                    help="local-cluster runs N separate single-core executor JVMs")
    ap.add_argument("--corpus-dir", default=None, help="reuse an existing corpus")
    ap.add_argument("--no-calibrate", action="store_true",
                    help="skip the raw-hardware extract-kernel calibration")
    ap.add_argument("--cfg", default="{}",
                    help="JSON dict of extra CrawlConfig kwargs for A/B "
                         "experiments (e.g. '{\"link_prededup\": false}')")
    ap.add_argument("--shuffle-mult", type=int, default=None,
                    help="shuffle partitions = MULT * cores at each level "
                         "(default: session factory's max(8, 2*cores))")
    args = ap.parse_args()
    cfg_extra = json.loads(args.cfg)

    corpus = args.corpus_dir
    if corpus is None:
        corpus = tempfile.mkdtemp(prefix="dcs_scale_corpus_", dir=SCRATCH)
        gen = r"""
import sys; sys.path.insert(0, {repo!r})
from data_collector_spark.session import get_spark
from data_collector_spark.sources.generator import synth_pages
spark = get_spark("dcs-gen", cores=32)
synth_pages(spark, {n}, n_hosts={h}, links_per_page=8, partitions=64,
            min_words={minw}, max_words={maxw})\
    .write.mode("overwrite").parquet({corpus!r})
print("GENDONE")
""".format(repo=REPO, n=args.n_urls, h=args.n_hosts, corpus=corpus,
           minw=args.min_words, maxw=args.max_words)
        subprocess.run([sys.executable, "-c", gen], check=True, cwd=REPO,
                       capture_output=True, text=True)

    lc = args.mode == "local-cluster"
    a = run_level(args.cores_a, corpus, args.budget, args.rounds, args.seeds,
                  args.repeats, lc, cfg_extra, args.shuffle_mult)
    b = run_level(args.cores_b, corpus, args.budget, args.rounds, args.seeds,
                  args.repeats, lc, cfg_extra, args.shuffle_mult)
    ratio = args.cores_b / args.cores_a
    eff = (b["urls_per_sec"] / a["urls_per_sec"]) / ratio
    result = {
        "corpus": {"n_urls": args.n_urls, "n_hosts": args.n_hosts,
                   "budget": args.budget, "rounds": args.rounds, "dir": corpus,
                   **({"cfg_extra": cfg_extra} if cfg_extra else {})},
        "level_a": a,
        "level_b": b,
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "pass_raw": eff >= 0.8,
    }

    # per-phase attribution (VERDICT r4 #1): the same RoundMetrics.phase_sec
    # marks at both core counts name WHERE the ratio is lost — a phase whose
    # efficiency sits at the kernel ceiling is memory-bus-bound hardware, a
    # phase far below it is engine structure (serial driver work, fixed job
    # overhead). driver_other = wall not covered by any phase mark (commit,
    # recrawl bookkeeping, inter-round driver gaps).
    def phase_totals(res: dict) -> dict:
        tot: dict[str, float] = {}
        for r in res["rounds"]:
            for k, v in (r.get("phase_sec") or {}).items():
                tot[k] = tot.get(k, 0.0) + v
        tot["driver_other"] = max(0.0, res["wall_sec"] - sum(tot.values()))
        return tot

    pa, pb = phase_totals(a), phase_totals(b)
    result["phase_attribution"] = {
        k: {
            "a_sec": round(pa.get(k, 0.0), 2),
            "b_sec": round(pb.get(k, 0.0), 2),
            "efficiency": (
                round((pa.get(k, 0.0) / pb[k]) / ratio, 3) if pb.get(k) else None
            ),
            "b_share": (
                round(pb.get(k, 0.0) / b["wall_sec"], 3) if b["wall_sec"] else None
            ),
        }
        for k in sorted(set(pa) | set(pb))
    }
    if not args.no_calibrate:
        # hardware ceiling for this workload class on this box: the same
        # extract kernel under raw multiprocessing (no Spark). On a real
        # N->4N cluster each executor keeps its own memory bus, so the
        # cluster analog of 'raw' is ~1.0 and the engine-relative number
        # is the one the >=0.8 bar governs.
        ca = run_calibration(args.cores_a)
        cb = run_calibration(args.cores_b)
        hw_eff = (cb / ca) / ratio
        sa = run_shuffle_calibration(args.cores_a)
        sb = run_shuffle_calibration(args.cores_b)
        shuf_eff = (sb / sa) / ratio
        result["shuffle_calibration"] = {
            "kernel": "sha1+2-level string groupBy, pure JVM, 60M rows",
            "rate_a": round(sa, 0), "rate_b": round(sb, 0),
            "shuffle_hw_efficiency": round(shuf_eff, 3),
            "covers": "exchange/sort/agg ceiling — pairs with the "
                      "frontier_write/fetch_log phases the same way the "
                      "extract kernel pairs with fetch_extract",
        }
        result["hw_calibration"] = {
            "kernel": "extract_text+links, pure multiprocessing",
            "rate_a": round(ca, 0), "rate_b": round(cb, 0),
            "hw_efficiency": round(hw_eff, 3),
            # coverage limit: the kernel exercises the Arrow/pandas extract
            # hot loop only — no shuffle, parquet IO, or JVM work — so on a
            # workload with lighter memory pressure the true ceiling may be
            # higher than this measures; read pass_calibrated accordingly
            "covers": "memory-bus ceiling of the extract hot loop only",
        }
        rel = eff / hw_eff if hw_eff > 0 else 0.0
        result["engine_relative_efficiency"] = round(rel, 3)
        # ADVICE r2: never OR the two verdicts into one 'pass' — the raw
        # number grades this box (shared DRAM, SMT), the calibrated one
        # grades the engine against the box's measured ceiling
        result["pass_calibrated"] = rel >= 0.8
    # VERDICT r5 #2: name the rule NEXT TO each boolean so downstream
    # artifacts (BENCH_rN.json, BASELINE.md) can't be read as disagreeing
    # about what a "calibrated pass" means — every verdict is per-SESSION
    result["rules"] = {
        "pass_raw": "(urls_per_sec@coresB / urls_per_sec@coresA) / (coresB/"
                    "coresA) >= 0.8 on THIS session (grades the shared-DRAM "
                    "box, not the engine)",
        "pass_calibrated": "engine_relative_efficiency = raw efficiency / "
                           "extract-kernel hw ceiling (same session) >= 0.8 "
                           "(grades the engine against the box's measured "
                           "ceiling; never OR-ed with pass_raw)",
    }
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
