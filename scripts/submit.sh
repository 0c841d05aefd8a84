#!/usr/bin/env bash
# spark-submit packaging (north rule: "packaged for spark-submit --py-files
# on a multi-executor cluster").
#
# Usage:
#   scripts/submit.sh [--master spark://host:7077] path/to/job.py [job args...]
#
# Builds a wheel-less zip of the package and ships it with --py-files; the
# job script imports `htrc_feature_reader_spark` exactly as in local mode.
# Cluster-side confs mirror session.py (AQE on, Arrow on, skew-join on);
# shuffle partitions should be set to ~2-3x total executor cores at launch,
# AQE re-coalesces at runtime.
set -euo pipefail

REPO="$(cd "$(dirname "$0")/.." && pwd)"
MASTER="local[*]"
if [[ "${1:-}" == "--master" ]]; then
  MASTER="$2"; shift 2
fi
JOB="${1:?usage: submit.sh [--master URL] job.py [args...]}"; shift

ZIP="$(mktemp -d)/htrc_feature_reader_spark.zip"
(cd "$REPO" && zip -qr "$ZIP" htrc_feature_reader_spark)

exec spark-submit \
  --master "$MASTER" \
  --py-files "$ZIP" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.coalescePartitions.enabled=true \
  --conf spark.sql.adaptive.skewJoin.enabled=true \
  --conf spark.sql.session.timeZone=UTC \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  "$JOB" "$@"
