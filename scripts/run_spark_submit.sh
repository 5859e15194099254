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
SEED_SAMPLE="${SPARK_GRAFT_SEED_SAMPLE:-200}"
SHUFFLE="${DCS_SHUFFLE_PARTITIONS:-64}"
LOCAL_DIR="${DCS_SPARK_LOCAL_DIR:-/dev/shm/dcs_spark_local}"

ZIP=$(mktemp -u /tmp/dcs_pkg_XXXX.zip)
(cd "$REPO" && zip -qr "$ZIP" data_collector_spark)

spark-submit --master "$MASTER" \
  --conf spark.sql.shuffle.partitions="$SHUFFLE" \
  --conf spark.local.dir="$LOCAL_DIR" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.session.timeZone=UTC \
  --py-files "$ZIP" \
  "$REPO/scripts/crawl_job.py" \
  --pages "$PAGES" --workdir "$WORKDIR" \
  --seed-sample "$SEED_SAMPLE" --rounds "$ROUNDS" --budget "$BUDGET"
rm -f "$ZIP"
