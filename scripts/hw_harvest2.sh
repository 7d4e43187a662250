#!/bin/bash
# Follow-up to hw_harvest.sh: waits for the main harvest to finish (it owns
# the TPU while running), then measures the serve-load coalescing A/B on
# real hardware. Safe to start any time; exits if the main harvest gave up.
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/hw_harvest
mkdir -p "$OUT"
log() { echo "$(date +%H:%M:%S) harvest2: $*" | tee -a "$OUT/harvest.log"; }

for i in $(seq 1 400); do
  if grep -q "GAVE UP" "$OUT/harvest.log" 2>/dev/null; then
    log "main harvest gave up; exiting"
    exit 1
  fi
  if grep -q "harvest complete" "$OUT/harvest.log" 2>/dev/null; then
    break
  fi
  sleep 120
done
if ! grep -q "harvest complete" "$OUT/harvest.log" 2>/dev/null; then
  log "timed out waiting for the main harvest"
  exit 1
fi

log "phase 4: serve-load coalescing A/B at 1M x 512 (real chip)"
timeout 3600 python scripts/bench_serve_load.py \
  --rows 1000000 --dim 512 --clients 16 --requests 256 \
  > "$OUT/serve_load.json.log" 2>&1
log "phase 4 exit=$? (see serve_load.json.log)"

log "phase 5: batched top-k selection A/B at serving shapes"
timeout 3600 python scripts/bench_batched_topk.py \
  > "$OUT/batched_topk.json.log" 2>&1
log "phase 5 exit=$? (see batched_topk.json.log)"
