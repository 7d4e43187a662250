#!/usr/bin/env python
"""Dump + summarise the optimized HLO of the production ViT-B/32 forward.

Round-3 established that the headline step's waste hides in XLA<->Pallas
boundary relayouts (transposing copies of the (B, SP, D) stream). This
audit recompiles the EXACT bench.py forward (preprocess + tower) and
reports every remaining copy/transpose/fusion that touches the activation
stream, so boundary work (embed/head) can be attributed before writing
any new kernel. Usage:  python scripts/audit_hlo.py [--model ViT-B-32]
"""

from __future__ import annotations

import argparse
import collections
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="ViT-B-32")
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--dump", default="/tmp/vit_hlo.txt")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from wise_tpu.models.clip.extractor import production_clip_config
    from wise_tpu.models.clip.model import CLIP
    from wise_tpu.models.clip.preprocess import preprocess_images_gemm

    os.environ["WISE_CLIP_DTYPE"] = "bfloat16"
    config = production_clip_config(args.model)
    model = CLIP(config)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, config.image_size, config.image_size, 3), jnp.float32),
        jnp.zeros((1, config.context_length), jnp.int32),
    )

    @jax.jit
    def step(params, frames):
        x = preprocess_images_gemm(frames, config.image_size)
        return model.apply(params, x, method=CLIP.encode_image)

    frames = np.zeros((args.batch, 256, 320, 3), dtype=np.uint8)
    lowered = step.lower(params, frames)
    compiled = lowered.compile()
    txt = compiled.as_text()
    with open(args.dump, "w") as f:
        f.write(txt)
    print(f"optimized HLO -> {args.dump} ({len(txt.splitlines())} lines)")

    # Count ops by kind; flag copies/transposes and their shapes.
    kind_bytes = collections.Counter()
    copies = []
    for line in txt.splitlines():
        m = re.match(r"\s*(%?[\w.\-]+) = (\w+)\[", line.replace(" ROOT ", " "))
        m2 = re.search(r"= ((?:bf16|f32|u8|s32|u32|pred)\[[^\]]*\])[^ ]* (\w+)",
                       line)
        if not m2:
            continue
        shape, op = m2.group(1), m2.group(2)
        if op in ("copy", "transpose", "bitcast", "reshape"):
            dt = shape.split("[")[0]
            dims = shape.split("[")[1].rstrip("]")
            try:
                n = 1
                for d in dims.split(","):
                    n *= int(d)
            except ValueError:
                n = 0
            bytes_ = n * (2 if dt == "bf16" else 4 if dt in ("f32", "s32", "u32") else 1)
            kind_bytes[op] += bytes_
            if op in ("copy", "transpose") and bytes_ >= 1 << 20:
                copies.append((bytes_, op, shape, line.strip()[:160]))
    print("\nbulk copy/transpose ops (>=1 MB):")
    for b, op, shape, line in sorted(copies, reverse=True):
        print(f"  {b/1e6:8.1f} MB  {op:9s} {shape}")
    total = sum(b for b, *_ in copies)
    print(f"  total bulk-copied bytes/step: {total/1e6:.1f} MB "
          f"(~{total/866e9*1e3:.2f} ms at HBM peak)")
    n_custom = txt.count("custom-call")
    print(f"\ncustom-calls (Pallas kernels etc.): {n_custom}")
    # fusions that read the big activation stream
    print("\nnon-kernel fusions with >=10 MB output:")
    for line in txt.splitlines():
        m2 = re.search(r"= ((?:bf16|f32)\[[^\]]*\])[^ ]* fusion", line)
        if m2:
            shape = m2.group(1)
            dims = shape.split("[")[1].rstrip("]")
            try:
                n = 1
                for d in dims.split(","):
                    n *= int(d)
            except ValueError:
                continue
            b = n * (2 if shape.startswith("bf16") else 4)
            if b >= 10 << 20:
                kindm = re.search(r"kind=(\w+)", line)
                print(f"  {b/1e6:8.1f} MB  {shape}  "
                      f"{kindm.group(1) if kindm else ''}  "
                      f"{line.strip()[:110]}")


if __name__ == "__main__":
    main()
