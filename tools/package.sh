#!/usr/bin/env bash
# Build the spark-submit --py-files artifact (north rule packaging contract).
set -euo pipefail
cd "$(dirname "$0")/.."
rm -f dist/brdoc.zip && mkdir -p dist
zip -qr dist/brdoc.zip br_doc_ocr_spark -x '*__pycache__*'
echo "dist/brdoc.zip:"
unzip -l dist/brdoc.zip | tail -3
cat <<USAGE
Submit with:
  spark-submit --py-files dist/brdoc.zip \\
    --conf spark.sql.adaptive.enabled=true \\
    your_driver.py
or run the bundled jobs:
  PYTHONPATH=dist/brdoc.zip python -m br_doc_ocr_spark.cli extract --help
USAGE
