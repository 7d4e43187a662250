#!/bin/bash
# Sixth harvest wave: rerun the batched top-k selection A/B after fixing
# the 2 GB closure-constant capture (db now rides as a jit argument).
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/hw_harvest
mkdir -p "$OUT"
log() { echo "$(date +%H:%M:%S) harvest6: $*" | tee -a "$OUT/harvest.log"; }

for i in $(seq 1 500); do
  if grep -q "harvest5: upstream failed\|harvest5: timed out" "$OUT/harvest.log" 2>/dev/null; then
    log "upstream failed; exiting"; exit 1
  fi
  if grep -q "wave 5 complete" "$OUT/harvest.log" 2>/dev/null; then
    break
  fi
  sleep 60
done
if ! grep -q "wave 5 complete" "$OUT/harvest.log" 2>/dev/null; then
  log "timed out waiting for wave 5"; exit 1
fi

log "phase 10: batched top-k selection A/B (fixed: db as jit argument)"
timeout 5400 python scripts/bench_batched_topk.py \
  > "$OUT/batched_topk2.json.log" 2>&1
log "phase 10 exit=$? (see batched_topk2.json.log)"
log "wave 6 complete"
