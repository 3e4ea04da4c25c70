#!/usr/bin/env bash
# Package crawlspark for spark-submit --py-files (north_rule deployment).
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/crawlspark.zip
if command -v zip >/dev/null 2>&1; then
  zip -qr dist/crawlspark.zip crawlspark -x '*__pycache__*'
else
  python - <<'EOF'
import os, zipfile
with zipfile.ZipFile("dist/crawlspark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for root, dirs, files in os.walk("crawlspark"):
        dirs[:] = [d for d in dirs if d != "__pycache__"]
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
EOF
fi
echo "wrote dist/crawlspark.zip"
