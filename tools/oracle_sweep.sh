#!/bin/bash
# Resumable big-SF oracle sweep: one oracle_check.py PROCESS PER QUERY, so a
# DuckDB blow-up (v1.0 under-accounts list-op memory — the sf10 ANN family
# peaks ~113 GB regardless of memory_limit) kills one query, not the sweep.
# PASS/FAIL lines accumulate in $3; already-recorded queries are skipped on
# re-run. Usage: oracle_sweep.sh <sf_dir> <out_dir> <log> [skip_csv]
set -u
SF=$1; OUT=$2; LOG=$3; SKIP=${4:-}
touch "$LOG"
python3 - "$OUT" <<'EOF' > /tmp/oracle_all_names
import json, sys
with open(f"{sys.argv[1]}/oracle_sql.json") as f:
    print("\n".join(sorted(json.load(f))))
EOF
while read -r name; do
  case ",$SKIP," in *",$name,"*) continue;; esac
  if grep -q "^PASS $name \|^FAIL $name" "$LOG"; then continue; fi
  ORACLE_FAST=1 ORACLE_THREADS=${ORACLE_THREADS:-8} \
  ORACLE_MEMORY=${ORACLE_MEMORY:-24GB} ORACLE_ONLY=$name \
    timeout "${ORACLE_TIMEOUT:-1800}" python3 "$(dirname "$0")/oracle_check.py" "$SF" "$OUT" \
    > /tmp/oracle_one.log 2>&1
  rc=$?
  if grep -q "^PASS $name" /tmp/oracle_one.log; then
    grep "^PASS $name" /tmp/oracle_one.log >> "$LOG"
  elif grep -q "^FAIL $name" /tmp/oracle_one.log; then
    grep "^FAIL $name" /tmp/oracle_one.log | head -1 >> "$LOG"
  else
    echo "FAIL $name: process rc=$rc (killed/oom/timeout)" >> "$LOG"
  fi
  tail -1 "$LOG"
done < /tmp/oracle_all_names
echo "SWEEP DONE: $(grep -c '^PASS' "$LOG") pass, $(grep -c '^FAIL' "$LOG") fail"
