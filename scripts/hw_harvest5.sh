#!/bin/bash
# Fifth harvest wave: re-measure the serve-load coalescing A/B after the
# two-phase (dispatch/finalize) coalescer fix — the first A/B showed the
# sync-readback-under-lock design HALVED throughput (0.54x qps).
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/hw_harvest
mkdir -p "$OUT"
log() { echo "$(date +%H:%M:%S) harvest5: $*" | tee -a "$OUT/harvest.log"; }

for i in $(seq 1 500); do
  if grep -q "harvest4: upstream failed\|harvest4: timed out" "$OUT/harvest.log" 2>/dev/null; then
    log "upstream failed; exiting"; exit 1
  fi
  if grep -q "wave 4 complete" "$OUT/harvest.log" 2>/dev/null; then
    break
  fi
  sleep 60
done
if ! grep -q "wave 4 complete" "$OUT/harvest.log" 2>/dev/null; then
  log "timed out waiting for wave 4"; exit 1
fi

log "phase 9: serve-load A/B with the two-phase coalescer"
timeout 3600 python scripts/bench_serve_load.py \
  --rows 1000000 --dim 512 --clients 16 --requests 256 \
  > "$OUT/serve_load2.json.log" 2>&1
log "phase 9 exit=$? (see serve_load2.json.log)"
log "wave 5 complete"
