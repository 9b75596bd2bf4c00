#!/bin/sh
# Package the engine for `spark-submit --py-files` (north-rule shipping mode).
#   ./scripts/make_pyfiles.sh [out.zip]   ->  dist/imdedup_plus_spark.zip
set -e
cd "$(dirname "$0")/.."
OUT="${1:-dist/imdedup_plus_spark.zip}"
mkdir -p "$(dirname "$OUT")"
rm -f "$OUT"
python - "$OUT" <<'PY'
import sys, zipfile, pathlib
out = sys.argv[1]
root = pathlib.Path("imdedup_plus_spark")
with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
    for p in sorted(root.rglob("*.py")):
        z.write(p, p.as_posix())
print("wrote", out)
PY
echo "submit with:"
echo "  spark-submit --py-files $OUT scripts/run_pipeline.py --input <tbl> --workdir <ckpt>"
