#!/bin/bash
# Full-registry sf1 sweep, resumable: runs check_correctness one chunk at
# a time, appending to the log; already-logged queries are skipped on
# restart. Usage: bash scripts/sweep_sf1.sh [logfile]
LOG=${1:-/tmp/sf1_sweep.log}
cd /root/repo
mapfile -t ALL < <(python - <<'PY'
import sys; sys.path.insert(0, '.')
from als_pyspark_spark.registry import load_all_queries, requirements_met
qs = load_all_queries()
for n, q in qs.items():
    if requirements_met(q):
        print(n)
PY
)
touch "$LOG"
CHUNK=12
todo=()
for q in "${ALL[@]}"; do
  if ! grep -q "  $q:" "$LOG"; then todo+=("$q"); fi
done
echo "# $(date +%T) sweeping ${#todo[@]} of ${#ALL[@]} queries" >> "$LOG"
i=0
while [ $i -lt ${#todo[@]} ]; do
  chunk=("${todo[@]:$i:$CHUNK}")
  timeout 2400 python scripts/check_correctness.py /root/repo/.scale/sf1 "${chunk[@]}" 2>/dev/null \
    | grep -aoE "(OK|FAIL|ok\(rows-only\)).*" >> "$LOG"
  i=$((i+CHUNK))
done
echo "# $(date +%T) sweep loop done" >> "$LOG"
grep -ac "OK " "$LOG"; grep -ac "FAIL" "$LOG"
