#!/usr/bin/env python
"""Fine-tune train-step A/B across the three kernel configurations
(VERDICT round-2 item 5 — the custom-VJP kernels must pay off in training,
not just inference):

  xla    — plain XLA towers (fused_attention=False, fused_block=False)
  attn   — fused VMEM attention kernel only (fused_attention=True)
  block  — whole-residual-block kernels + pooled last block
           (fused_block=True, pool_last_block=True: the production
           inference config, via the *_train custom-VJP wrappers)

Runs CLIPTrainer train steps on ViT-B/32 at the given batch on the real
chip, measuring ms/step per configuration. xla/attn backwards are the
XLA vjp; the block config runs the saved-activation custom VJP (the
kernel forward emits the qkv / pre-gelu residuals the backward consumes
— see ops/block.py `fused_*_block_res`). Emits one JSON line
with ms_step_{xla,attn,block} and speedup_attn / speedup_block (vs xla).

    python scripts/bench_train_step.py [--batch 256] [--iters 8]
"""

import argparse
import dataclasses
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--model", default="ViT-B-32")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from wise_tpu.models.clip.model import get_clip_config
    from wise_tpu.parallel.mesh import get_mesh
    from wise_tpu.parallel.train import CLIPTrainer

    from wise_tpu.utils.profiling import measure_roundtrip

    roundtrip = measure_roundtrip()
    mesh = get_mesh(dp=jax.device_count())
    out = {"batch": args.batch, "model": args.model,
           "tunnel_roundtrip_ms": round(roundtrip * 1e3, 1)}
    B = args.batch
    rng = np.random.default_rng(0)
    base = get_clip_config(args.model)
    images = np.asarray(rng.standard_normal(
        (B, base.image_size, base.image_size, 3)), np.float32)
    tokens = np.asarray(rng.integers(1, 1000, (B, base.context_length)),
                        np.int32)

    # three configurations:
    #   xla   — no kernels anywhere (round-2 baseline; XLA vjp backward)
    #   attn  — fused_attention_trainable only (round-2 measured 1.007x:
    #           the forward still pays the XLA<->Pallas relayout tax;
    #           XLA-style recompute vjp backward)
    #   block — whole-block kernels via the _train wrappers (all-kernel
    #           forward, no boundary copies) + pooled last layer; the
    #           SAVED-ACTIVATION backward (round 4) differentiates from
    #           the kernel-emitted qkv / pre-gelu residuals
    variants = {
        "xla": dict(fused_attention=False, fused_block=False,
                    pool_last_block=False),
        "attn": dict(fused_attention=True, fused_block=False,
                     pool_last_block=False),
        "block": dict(fused_attention=False, fused_block=True,
                      pool_last_block=True),
    }
    for name, kw in variants.items():
        cfg = dataclasses.replace(base, dtype=jnp.bfloat16, **kw)
        trainer = CLIPTrainer(cfg, mesh)
        params, opt_state = trainer.init(jax.random.PRNGKey(0))
        step = trainer.make_train_step()
        imgs = jax.device_put(jnp.asarray(images), trainer.batch_sharding)
        toks = jax.device_put(jnp.asarray(tokens), trainer.batch_sharding)
        params, opt_state, loss = step(params, opt_state, imgs, toks)
        np.asarray(loss)  # compile + warm
        roundtrip = measure_roundtrip()  # re-measure: the tunnel drifts
        t0 = time.perf_counter()
        for _ in range(args.iters):
            params, opt_state, loss = step(params, opt_state, imgs, toks)
        np.asarray(loss)
        dt = (time.perf_counter() - t0 - roundtrip) / args.iters
        out[f"{name}_ms_per_step"] = round(dt * 1e3, 2)
        out[f"{name}_loss"] = round(float(loss), 4)

    out["speedup_attn"] = round(
        out["xla_ms_per_step"] / out["attn_ms_per_step"], 3)
    out["speedup_block"] = round(
        out["xla_ms_per_step"] / out["block_ms_per_step"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
