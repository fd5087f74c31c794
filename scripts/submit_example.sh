#!/usr/bin/env bash
# North-rule invocation path: package the engine and run it via
# spark-submit --py-files — the zip is self-contained (verified by
# running from a directory that does NOT contain the repo).
#   On a real cluster swap --master for your cluster master / k8s, and
#   scale executors with --num-executors/--executor-cores.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
ZIP=/tmp/largeea_spark.zip
rm -f "$ZIP"
(cd "$REPO" && zip -qr "$ZIP" largeea_spark -x "*__pycache__*")
cp "$REPO/scripts/submit_job.py" /tmp/submit_job.py
cd /tmp
exec spark-submit --master "${SPARK_MASTER:-local[4]}" \
    --py-files "$ZIP" /tmp/submit_job.py
