#!/usr/bin/env bash
# Build dist/baskerville_spark.zip for spark-submit --py-files.
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/baskerville_spark.zip
zip -qr dist/baskerville_spark.zip baskerville_spark -x '*__pycache__*'
echo "dist/baskerville_spark.zip"
