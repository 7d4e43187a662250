#!/bin/bash
# Fourth harvest wave: after wave 3, the end-to-end decision runs for the
# flat attention-block finding (phase 3: flat g=2 1.079 ms vs 1.29-1.45 ms
# batched at ViT-B/32 shapes) — the round-3 rule is that only end-to-end
# A/B decides production config.
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/hw_harvest
mkdir -p "$OUT"
log() { echo "$(date +%H:%M:%S) harvest4: $*" | tee -a "$OUT/harvest.log"; }

for i in $(seq 1 500); do
  if grep -q "upstream harvest failed\|harvest3: timed out" "$OUT/harvest.log" 2>/dev/null; then
    log "upstream failed; exiting"; exit 1
  fi
  if grep -q "wave 3 complete" "$OUT/harvest.log" 2>/dev/null; then
    break
  fi
  sleep 60
done
if ! grep -q "wave 3 complete" "$OUT/harvest.log" 2>/dev/null; then
  log "timed out waiting for wave 3"; exit 1
fi

log "phase 8: end-to-end block vs blockflat A/B at ViT-B/32"
timeout 3600 python scripts/bench_encoder_ab.py \
  --configs block,blockflat --batch 512 --iters 15 --repeats 3 \
  > "$OUT/encoder_ab_flat.json.log" 2>&1
log "phase 8 exit=$? (see encoder_ab_flat.json.log)"
log "wave 4 complete"
