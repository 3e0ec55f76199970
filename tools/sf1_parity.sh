#!/bin/bash
# Per-oracle time-boxed DuckDB parity sweep (r16, verdict #1): one
# parity.py invocation per query under `timeout`, so a quadratic
# oracle names itself as an exclusion (TIMEOUT line) instead of
# hanging the whole sweep. Usage:
#   tools/sf1_parity.sh <sfDir> <verifyOutDir> [perQuerySeconds]
set -u
SF=${1:-/root/repo/testdata/sf1}
OUT=${2:-/tmp/verify_sf1}
BUDGET=${3:-240}
for q in $(python3 -c "import json;print(' '.join(sorted(json.load(open('$OUT/oracle_sql.json')))))"); do
  line=$(timeout "$BUDGET" python3 tools/parity.py "$SF" "$OUT" "$q" 2>/dev/null \
    | grep -E "^ok|^FAIL|^TYPEFAIL" | head -1)
  if [ -z "$line" ]; then
    echo "TIMEOUT $q (> ${BUDGET}s oracle budget)"
  else
    echo "$line"
  fi
done