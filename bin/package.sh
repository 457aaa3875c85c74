#!/bin/sh
# Build dist/heritrix_spark.zip for spark-submit --py-files.
# The zip is importable directly from the executors' sys.path (the
# PSL table loads via importlib.resources, so no extraction needed).
set -eu
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/heritrix_spark.zip
zip -qr dist/heritrix_spark.zip heritrix_spark \
    -x 'heritrix_spark/__pycache__/*' -x 'heritrix_spark/*/__pycache__/*'
echo "dist/heritrix_spark.zip"
