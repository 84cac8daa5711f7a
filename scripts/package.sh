#!/usr/bin/env bash
# Build the --py-files artifact for spark-submit shipping.
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/geomesa_spark.zip
# package source only (no __pycache__), plus the driver-contract module so
# cluster-side code can import the query definitions too
zip -qr dist/geomesa_spark.zip geomesa_spark __spark_entry__.py -x '*__pycache__*'
echo "dist/geomesa_spark.zip:"
unzip -l dist/geomesa_spark.zip | tail -3
