#!/usr/bin/env bash
# Package the engine for spark-submit --py-files (north_star launch mode):
#   tools/package.sh              -> dist/ai_invoice_ocr_engine_spark.zip
#   spark-submit --master ... --py-files dist/ai_invoice_ocr_engine_spark.zip \
#       tools/submit_extract.py --docs ... --media ... --out ...
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/ai_invoice_ocr_engine_spark.zip
python - <<'EOF'
import os, zipfile
with zipfile.ZipFile("dist/ai_invoice_ocr_engine_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for root, _dirs, files in os.walk("ai_invoice_ocr_engine_spark"):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
print("wrote dist/ai_invoice_ocr_engine_spark.zip")
EOF
