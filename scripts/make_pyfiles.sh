#!/usr/bin/env bash
# Package the engine for spark-submit --py-files.
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/document_retrieval_spark.zip
zip -qr dist/document_retrieval_spark.zip document_retrieval_spark \
    -x '*__pycache__*'
echo "wrote dist/document_retrieval_spark.zip"
