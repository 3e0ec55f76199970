#!/bin/bash
# Per-oracle time-boxed DuckDB parity sweep (r16, verdict #1): one
# parity.py invocation per query under `timeout`, so a quadratic
# oracle names itself as an exclusion (TIMEOUT line) instead of
# hanging the whole sweep. Runs with PARITY_HOIST=1 (r17): top-level
# CTE chains execute as temp tables, giving DuckDB real cardinalities
# instead of the estimate-driven build-side flips that made three
# linear-mass oracles read as >1800s "pair-mass replays"; the hoisted
# path is cross-validated against the driver's single-statement path
# at sf0.001/0.01/0.1 (all green both ways). Usage:
#   tools/sf1_parity.sh <sfDir> <verifyOutDir> [perQuerySeconds]
set -u
export PARITY_HOIST=1
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