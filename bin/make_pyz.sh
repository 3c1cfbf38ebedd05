#!/bin/sh
# Package the engine for spark-submit --py-files (SURVEY.md J6).
# Usage: bin/make_pyz.sh [out.zip]   (default: dist/engine.zip)
set -eu
cd "$(dirname "$0")/.."
OUT="${1:-dist/engine.zip}"
mkdir -p "$(dirname "$OUT")"
rm -f "$OUT"
python - "$OUT" <<'EOF'
import sys, zipfile, pathlib
out = sys.argv[1]
root = pathlib.Path(".")
with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
    for p in sorted(root.glob("ocr_tool_spark/**/*.py")):
        z.write(p, p.as_posix())
print(f"wrote {out}")
EOF
