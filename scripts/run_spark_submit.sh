#!/usr/bin/env bash
# Package the engine and run the crawl via spark-submit --py-files
# (north_rule packaging requirement). Defaults exercise a small local run.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
PAGES="${1:?usage: run_spark_submit.sh PAGES_PARQUET WORKDIR [ROUNDS] [BUDGET]}"
WORKDIR="${2:?}"
ROUNDS="${3:-2}"
BUDGET="${4:-100}"
MASTER="${SPARK_GRAFT_MASTER:-local[${SPARK_GRAFT_CPUS:-32}]}"

ZIP=$(mktemp -u /tmp/dcs_pkg_XXXX.zip)
(cd "$REPO" && zip -qr "$ZIP" data_collector_spark)

spark-submit --master "$MASTER" \
  --conf spark.sql.shuffle.partitions=64 \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.session.timeZone=UTC \
  --py-files "$ZIP" \
  "$REPO/scripts/crawl_job.py" \
  --pages "$PAGES" --workdir "$WORKDIR" \
  --seed-sample 200 --rounds "$ROUNDS" --budget "$BUDGET"
rm -f "$ZIP"
