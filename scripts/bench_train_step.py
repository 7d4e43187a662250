#!/usr/bin/env python
"""Fine-tune train-step A/B: fused attention kernel vs XLA path
(VERDICT round-2 item 5 — the custom-VJP kernel must pay off in training,
not just inference).

Runs CLIPTrainer train steps on ViT-B/32 at the given batch on the real
chip, measuring ms/step with fused_attention on and off. The backward is
the recompute-style XLA vjp either way; the delta is the fused forward
(primal + the recompute's forward half stays XLA).

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

    for fused in (False, True):
        cfg = dataclasses.replace(
            base, dtype=jnp.bfloat16, fused_attention=fused
        )
        trainer = CLIPTrainer(cfg, mesh)
        params, opt_state = trainer.init(jax.random.PRNGKey(0))
        step = trainer.make_train_step()
        imgs = jax.device_put(jnp.asarray(images), trainer.batch_sharding)
        toks = jax.device_put(jnp.asarray(tokens), trainer.batch_sharding)
        params, opt_state, loss = step(params, opt_state, imgs, toks)
        np.asarray(loss)  # compile + warm
        t0 = time.perf_counter()
        for _ in range(args.iters):
            params, opt_state, loss = step(params, opt_state, imgs, toks)
        np.asarray(loss)
        dt = (time.perf_counter() - t0 - roundtrip) / args.iters
        key = "fused_ms_per_step" if fused else "xla_ms_per_step"
        out[key] = round(dt * 1e3, 2)
        out[("fused" if fused else "xla") + "_loss"] = round(float(loss), 4)

    out["speedup"] = round(out["xla_ms_per_step"] / out["fused_ms_per_step"],
                           3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
