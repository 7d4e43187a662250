#!/bin/bash
# One-shot hardware-tail harvest for round 3 (run under tmux; survives
# tool timeouts). Probes the flaky dev tunnel every 4 min; the moment it
# answers, runs the remaining hardware-gated work in priority order, each
# phase logged under /tmp/hw_harvest/. Phases are independent: a mid-phase
# tunnel drop only loses that phase (each has its own timeout).
#
#   tmux new-session -d -s harvest 'bash scripts/hw_harvest.sh'
#
# Phase 1  profile_clap --swin-ab   -> the open ROADMAP item (CLAP roofline
#                                      attribution + fused-Swin decision)
# Phase 2  integration_smoke        -> SMOKE_r03 on-chip drive evidence
# Phase 3  bench_block_kernels flat -> flat-2D calibration probe at ViT-B/32
#                                      production shapes (speculative perf)
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/hw_harvest
mkdir -p "$OUT"
log() { echo "$(date +%H:%M:%S) $*" | tee -a "$OUT/harvest.log"; }

log "waiting for the TPU tunnel..."
up=0
for i in $(seq 1 200); do
  if timeout 180 python -c "
import jax, numpy as np, jax.numpy as jnp
x = jnp.ones((128,128), jnp.bfloat16)
assert float(np.asarray(x @ x)[0,0]) == 128.0
print('tunnel up:', jax.devices()[0].platform)
" >> "$OUT/harvest.log" 2>&1; then
    up=1; break
  fi
  log "probe $i: down"
  sleep 240
done
if [ "$up" != 1 ]; then log "GAVE UP: tunnel never came back"; exit 1; fi
log "tunnel UP — harvesting"

log "phase 1: CLAP roofline + swin A/B (long: ~8 distinct compiles)"
timeout 5400 python scripts/profile_clap.py --swin-ab \
  > "$OUT/clap_profile.json.log" 2>&1
log "phase 1 exit=$? (see clap_profile.json.log)"

log "phase 2: integration smoke (SMOKE_r03 evidence)"
timeout 1800 python scripts/integration_smoke.py --keep /tmp/smoke_r3 \
  > "$OUT/smoke.log" 2>&1
log "phase 2 exit=$?"

log "phase 3: flat-2D block-kernel probe at ViT-B/32 shapes"
timeout 2700 python scripts/bench_block_kernels.py \
  --batch 512 --seq 56 --width 768 --heads 12 --n-valid 50 --groups 8,2,1 \
  > "$OUT/block_flat_b32.log" 2>&1
log "phase 3 exit=$?"

log "harvest complete"
