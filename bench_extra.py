#!/usr/bin/env python3
"""Extra measurement harness for optimization rounds (bench.py is frozen).

Times individual declared queries with the noop sink (guide §1.4), labels
jobs (§1.5), and dumps .explain("formatted") for each measured query to
plans/<tag>/<query>_<suffix>.txt.

Usage:
  python bench_extra.py [--sf DIR] [--queries a,b,c] [--samples N]
                        [--plans-dir plans/r07] [--suffix before]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_collector_spark.plans import QUERIES  # noqa: E402
from data_collector_spark.session import get_spark  # noqa: E402


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--queries", default=None, help="comma list; default: bench.py headline set")
    ap.add_argument("--samples", type=int, default=3)
    ap.add_argument("--plans-dir", default=None)
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--warm-dir", default="/root/testdata/sf0.001")
    args = ap.parse_args()

    if args.queries:
        names = args.queries.split(",")
    else:
        names = [
            "q1_pricing_summary", "j2_broadcast_dims", "j5_anti_dedup_insert",
            "w1_wave_pop", "w3_sessionize", "s8_merge_upsert", "dedup_exact",
            "dedup_minhash_lsh", "dedup_simhash", "ann_cosine_topk",
            "text_token_counts", "text_quality_score", "st_tumbling_window",
        ]

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("dcs-bench-extra", cores=cpus)
    warm = args.warm_dir if os.path.isdir(args.warm_dir) else args.sf

    out = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"warm:{name}")
        _force(QUERIES[name](spark, warm))
        df = QUERIES[name](spark, args.sf)
        if args.plans_dir:
            os.makedirs(args.plans_dir, exist_ok=True)
            with open(os.path.join(args.plans_dir, f"{name}_{args.suffix}.txt"), "w") as f:
                f.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
        walls = []
        for s in range(args.samples):
            spark.sparkContext.setJobDescription(f"{name}[{s}]")
            t0 = time.monotonic()
            _force(QUERIES[name](spark, args.sf))
            walls.append(round(time.monotonic() - t0, 3))
        out[name] = {"median": sorted(walls)[len(walls) // 2], "samples": walls}
        print(f"[extra] {name}: {out[name]}", file=sys.stderr, flush=True)
    print(json.dumps({"sf": args.sf, "queries": out}))


if __name__ == "__main__":
    main()
