#!/usr/bin/env bash
# Package caterpillar_spark for spark-submit --py-files.
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/caterpillar_spark.zip
python - <<'EOF'
import os, zipfile
with zipfile.ZipFile("dist/caterpillar_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for root, dirs, files in os.walk("caterpillar_spark"):
        dirs[:] = [d for d in dirs if d != "__pycache__"]
        for f in files:
            p = os.path.join(root, f)
            z.write(p, p)
print("wrote dist/caterpillar_spark.zip")
EOF
