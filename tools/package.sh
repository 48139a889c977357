#!/usr/bin/env bash
# Build the --py-files artifact for spark-submit (SURVEY §7.2 step 8).
#   tools/package.sh [out.zip]
set -euo pipefail
cd "$(dirname "$0")/.."
out="${1:-dist/fhir_data_validation_spark.zip}"
mkdir -p "$(dirname "$out")"
rm -f "$out"
python - "$out" <<'EOF'
import sys, zipfile, pathlib
out = sys.argv[1]
root = pathlib.Path("fhir_data_validation_spark")
with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
    for p in sorted(root.rglob("*.py")):
        if "__pycache__" not in p.parts:
            z.write(p, p.as_posix())
print(out)
EOF
