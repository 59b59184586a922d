#!/usr/bin/env bash
# Package the engine for cluster deployment: spark-submit --py-files
# (the north rule's deployment mode). Produces dist/rsgislib_spark.zip.
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/rsgislib_spark.zip
python - <<'EOF'
import os
import zipfile

with zipfile.ZipFile("dist/rsgislib_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for root, _, files in os.walk("rsgislib_spark"):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
print("wrote dist/rsgislib_spark.zip")
EOF
