#!/bin/bash
# Third harvest wave: waits for hw_harvest2.sh's phase 5 to finish (it owns
# the TPU), then measures (6) the CLAP profile with the optimized mel
# frontend + fused-Swin default + on-chip cosine check, and (7) the
# preprocess resize-as-GEMM variants probe.
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/hw_harvest
mkdir -p "$OUT"
log() { echo "$(date +%H:%M:%S) harvest3: $*" | tee -a "$OUT/harvest.log"; }

for i in $(seq 1 500); do
  if grep -q "GAVE UP\|harvest2: timed out" "$OUT/harvest.log" 2>/dev/null; then
    log "upstream harvest failed; exiting"
    exit 1
  fi
  if grep -q "phase 5 exit" "$OUT/harvest.log" 2>/dev/null; then
    break
  fi
  sleep 60
done
if ! grep -q "phase 5 exit" "$OUT/harvest.log" 2>/dev/null; then
  log "timed out waiting for phase 5"
  exit 1
fi

log "phase 6: CLAP profile with optimized mel + fused-Swin default + cos"
timeout 3600 python scripts/profile_clap.py --swin-ab --skip-stages \
  > "$OUT/clap_profile2.json.log" 2>&1
log "phase 6 exit=$? (see clap_profile2.json.log)"

log "phase 7: preprocess resize-as-GEMM variants at ViT-B/32 shapes"
timeout 2700 python scripts/bench_preprocess_variants.py \
  > "$OUT/preprocess_variants.log" 2>&1
log "phase 7 exit=$?"
log "wave 3 complete"
