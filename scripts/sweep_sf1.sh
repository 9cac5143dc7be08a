#!/bin/bash
# Full-registry sf1 sweep, resumable: runs check_correctness one chunk at
# a time, appending to the log; already-logged queries are skipped on
# restart. Usage: bash scripts/sweep_sf1.sh [logfile]
#
# Known-slow DuckDB-oracle replays (measured round 13, PERF.md: tier_recall
# ~1300s replays three tiers' oracles; fuzzy_part_match ~1250s of
# single-threaded Levenshtein) get their OWN one-query chunks with a larger
# timeout — co-chunked with anything else they blow the normal chunk budget
# and the killed sibling silently vanishes from the log. After the loop, any
# query still missing from the log (a straggler killed by a chunk timeout)
# is re-run individually at the slow timeout, so a full sweep needs zero
# manual re-runs.
LOG=${1:-/tmp/sf1_sweep.log}
SLOW="q_dedup_tier_recall q_fuzzy_part_match"
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
run_chunk() { # $1 = timeout, rest = queries
  local t=$1; shift
  # tr strips CR so carriage-return progress output on the shared line can
  # never leak into the log (the grep pattern's '.' matches \r; and
  # '[^\r]' in POSIX ERE means "not backslash, not r" — the r12 trap)
  timeout "$t" python scripts/check_correctness.py /root/repo/.scale/sf1 "$@" 2>/dev/null \
    | tr -d '\r' | grep -aoE "(OK|FAIL|ok\(rows-only\)).*" >> "$LOG"
}
is_slow() { case " $SLOW " in *" $1 "*) return 0;; *) return 1;; esac; }
todo=() slow_todo=()
for q in "${ALL[@]}"; do
  if ! grep -q "  $q:" "$LOG"; then
    if is_slow "$q"; then slow_todo+=("$q"); else todo+=("$q"); fi
  fi
done
echo "# $(date +%T) sweeping $(( ${#todo[@]} + ${#slow_todo[@]} )) of ${#ALL[@]} queries (${#slow_todo[@]} slow-class)" >> "$LOG"
i=0
while [ $i -lt ${#todo[@]} ]; do
  run_chunk 2400 "${todo[@]:$i:$CHUNK}"
  i=$((i+CHUNK))
done
for q in "${slow_todo[@]}"; do
  echo "# $(date +%T) slow-class: $q" >> "$LOG"
  run_chunk 3600 "$q"
done
# straggler pass: a chunk timeout kills its in-flight query without a log
# line — re-run anything still missing, one query per invocation
for q in "${ALL[@]}"; do
  if ! grep -q "  $q:" "$LOG"; then
    echo "# $(date +%T) straggler re-run: $q" >> "$LOG"
    run_chunk 3600 "$q"
  fi
done
echo "# $(date +%T) sweep loop done" >> "$LOG"
grep -ac "OK " "$LOG"; grep -ac "FAIL" "$LOG"
