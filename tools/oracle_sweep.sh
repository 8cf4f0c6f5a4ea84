#!/bin/bash
# Resumable big-SF oracle sweep: one oracle_check.py PROCESS PER QUERY, so a
# DuckDB blow-up (v1.0 under-accounts list-op memory — the sf10 ANN family
# peaks ~113 GB regardless of memory_limit) kills one query, not the sweep.
# PASS/FAIL lines accumulate in $3; already-recorded queries are skipped on
# re-run. Usage: oracle_sweep.sh <sf_dir> <out_dir> <log> [skip_csv]
set -u
SF=$1; OUT=$2; LOG=$3; SKIP=${4:-}
touch "$LOG"
# per-instance scratch log: two concurrent sweeps sharing a fixed temp path
# clobber each other's PASS/FAIL lines between the run and the grep (seen
# as spurious "rc=0 killed" entries in the r11 sf10 sweep)
ONE=$(mktemp /tmp/oracle_one.XXXXXX.log)
NAMES=$(mktemp /tmp/oracle_names.XXXXXX)
trap 'rm -f "$ONE" "$NAMES"' EXIT
python3 - "$OUT" <<'EOF' > "$NAMES"
import json, sys
with open(f"{sys.argv[1]}/oracle_sql.json") as f:
    print("\n".join(sorted(json.load(f))))
EOF
while read -r name; do
  case ",$SKIP," in *",$name,"*) continue;; esac
  # resume-skip anchors match the exact emitted line shapes ("PASS name (N
  # rows)" / "FAIL name: ..."): the catalog has prefix-colliding names
  # (dedup_ngram_jaccard vs dedup_ngram_jaccard_oracle_baseline), and an
  # unanchored FAIL match made a logged longer-name failure silently skip
  # the shorter name's run entirely
  if grep -q "^PASS $name (\|^FAIL $name:" "$LOG"; then continue; fi
  ORACLE_FAST=1 ORACLE_THREADS=${ORACLE_THREADS:-8} \
  ORACLE_MEMORY=${ORACLE_MEMORY:-24GB} ORACLE_ONLY=$name \
    timeout "${ORACLE_TIMEOUT:-1800}" python3 "$(dirname "$0")/oracle_check.py" "$SF" "$OUT" \
    > "$ONE" 2>&1
  rc=$?
  if grep -q "^PASS $name (" "$ONE"; then
    grep "^PASS $name (" "$ONE" >> "$LOG"
  elif grep -q "^FAIL $name:" "$ONE"; then
    grep "^FAIL $name:" "$ONE" | head -1 >> "$LOG"
  else
    echo "FAIL $name: process rc=$rc (killed/oom/timeout)" >> "$LOG"
  fi
  tail -1 "$LOG"
done < "$NAMES"
echo "SWEEP DONE: $(grep -c '^PASS' "$LOG") pass, $(grep -c '^FAIL' "$LOG") fail"
