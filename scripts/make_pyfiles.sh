#!/usr/bin/env bash
# Build the --py-files zip for spark-submit.
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/symtseries_spark.zip
zip -qr dist/symtseries_spark.zip symtseries_spark -x '*__pycache__*'
echo "dist/symtseries_spark.zip"
