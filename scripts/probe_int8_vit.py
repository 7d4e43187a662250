#!/usr/bin/env python
"""Quantized ViT inference probe (round-4 VERDICT #4 — the one unpulled
encoder lever).

Three measured variants of the ViT-B/32 VISION tower at the production
step shape (B=512, preprocessed images in), interleaved in one process so
the tunnel drift cancels (round-4 probe protocol):

  bf16      — plain-ops tower in bf16 (the same code path as w8a8 with
              quantization off: the only diff in the A/B is the GEMM).
  w8a8      — the four transformer GEMMs (qkv, attn out, fc, proj) run as
              int8 x int8 -> int32 MXU dots with dynamic per-token
              activation scales and per-channel weight scales; everything
              else (LN f32, softmax f32, residuals bf16) identical.
  wo-int8   — weight-only int8: per-channel int8 weights dequantised to
              bf16 in-jit, then the PRODUCTION fused-kernel model applies
              them (tests the HBM-weight-traffic lever alone).

Also timed: the production fused-bf16 tower (the 15k f/s headline path,
same tower-only protocol) as the bar any quantized variant must clear.
Accuracy gate: embedding cosine vs the plain bf16 tower.

v5e context: bf16 MXU ~200 TFLOP/s measured; int8 MXU is nominally ~2x.
ViT-B/32 at B=512 runs ~67% MFU on the fused path, so w8a8's ceiling is
real only if the int8 path composes without layout/requant overhead
eating the 2x.
"""

import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

B = 512
N_ITER = 40


def _ln(xf, scale, bias, eps=1e-5):
    xf = xf.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(xf * xf, -1, keepdims=True) - mean * mean, 0.0)
    return (xf - mean) * jax.lax.rsqrt(var + eps) * scale + bias


def make_tower(int8: bool):
    """Plain ViT-B/32 vision tower forward (params passed as an ARG —
    a closure-captured tree is embedded as compile-payload constants and
    this remote-compile backend rejects >~100 MB payloads with HTTP 413);
    `int8` switches the four transformer GEMMs to w8a8."""
    dt = jnp.bfloat16

    def gemm(x, w, b):
        # x: (..., D) bf16; w: (D, F) f32 param
        if not int8:
            y = x @ w.astype(dt)
        else:
            sx = jnp.max(jnp.abs(x).astype(jnp.float32), axis=-1,
                         keepdims=True) / 127.0
            x8 = jnp.rint(
                x.astype(jnp.float32) / jnp.where(sx == 0, 1, sx)
            ).astype(jnp.int8)
            sw = jnp.max(jnp.abs(w), axis=0) / 127.0
            w8 = jnp.rint(w / jnp.where(sw == 0, 1, sw)).astype(jnp.int8)
            y32 = jax.lax.dot_general(
                x8, w8, dimension_numbers=(((x8.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            y = (y32.astype(jnp.float32) * sx * sw[None, :]).astype(dt)
        return y + b.astype(dt)

    def forward(params_v, images):
        c = params_v["conv1"]["kernel"]  # (32, 32, 3, 768)
        b_img = images.shape[0]
        p = 32
        grid = 7
        xp = images.astype(dt).reshape(b_img, grid, p, grid, p, 3)
        xp = xp.transpose(0, 1, 3, 2, 4, 5).reshape(b_img, grid * grid,
                                                    p * p * 3)
        x = xp @ c.reshape(p * p * 3, 768).astype(dt)
        cls = jnp.broadcast_to(
            params_v["class_embedding"].astype(dt), (b_img, 1, 768)
        )
        x = jnp.concatenate([cls, x], axis=1)
        x = x + params_v["positional_embedding"].astype(dt)
        x = _ln(x, params_v["ln_pre"]["scale"],
                params_v["ln_pre"]["bias"]).astype(dt)
        heads, hd = 12, 64
        for i in range(12):
            blk = params_v["transformer"][f"resblocks_{i}"]
            y = _ln(x, blk["ln_1"]["scale"], blk["ln_1"]["bias"]).astype(dt)
            qkv = gemm(y, blk["attn"]["in_proj"]["kernel"],
                       blk["attn"]["in_proj"]["bias"])
            q, k, v = jnp.split(qkv, 3, axis=-1)
            bq, t, _ = q.shape
            q = q.reshape(bq, t, heads, hd)
            k = k.reshape(bq, t, heads, hd)
            v = v.reshape(bq, t, heads, hd)
            logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(hd)
            probs = jax.nn.softmax(logits.astype(jnp.float32),
                                   axis=-1).astype(dt)
            att = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(bq, t, 768)
            x = x + gemm(att, blk["attn"]["out_proj"]["kernel"],
                         blk["attn"]["out_proj"]["bias"])
            y = _ln(x, blk["ln_2"]["scale"], blk["ln_2"]["bias"]).astype(dt)
            h = gemm(y, blk["mlp_fc"]["kernel"], blk["mlp_fc"]["bias"])
            h = jax.nn.gelu(h.astype(jnp.float32), approximate=False
                            ).astype(dt)
            x = x + gemm(h, blk["mlp_proj"]["kernel"],
                         blk["mlp_proj"]["bias"])
        pooled = _ln(x[:, 0], params_v["ln_post"]["scale"],
                     params_v["ln_post"]["bias"])
        z = pooled @ params_v["proj"].astype(jnp.float32)
        return z / jnp.linalg.norm(z, axis=-1, keepdims=True)

    return forward


def quantize_weight_tree(params):
    """Per-channel int8 codes + scales for every >=2-D float leaf above
    64k elements; small leaves pass through. Returns (payload, rebuild)."""
    leaves, treedef = jax.tree_util.tree_flatten(params)
    payload = []
    for leaf in leaves:
        arr = np.asarray(leaf)
        if (arr.ndim >= 2 and arr.size >= (1 << 16)
                and np.issubdtype(arr.dtype, np.floating)):
            flat = arr.reshape(-1, arr.shape[-1])
            s = (np.abs(flat).max(axis=0) / 127.0).astype(np.float32)
            codes = np.rint(arr / np.where(s == 0, 1, s)).astype(np.int8)
            payload.append(("q", jnp.asarray(codes), jnp.asarray(s)))
        else:
            payload.append(("f", jnp.asarray(arr), None))
    qleaves = tuple(
        (c, s) if tag == "q" else (c,) for tag, c, s in payload
    )
    tags = tuple(tag for tag, _, _ in payload)

    def rebuild(qleaves):
        out = []
        for tag, parts in zip(tags, qleaves):
            if tag == "q":
                codes, s = parts
                out.append(codes.astype(jnp.float32) * s)
            else:
                out.append(parts[0])
        return jax.tree_util.tree_unflatten(treedef, out)

    return qleaves, rebuild


def time_step(step_fn, *args, n_iter=N_ITER, passes=2):
    carry = jnp.float32(0)
    carry = step_fn(*args, carry)
    np.asarray(carry)  # compile + warm
    best = None
    for _ in range(passes):
        t0 = time.perf_counter()
        for _ in range(n_iter):
            carry = step_fn(*args, carry)
        np.asarray(carry)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return B * n_iter / best


def main():
    import os

    from wise_tpu.models.clip.extractor import production_clip_config
    from wise_tpu.models.clip.model import CLIP

    print(f"backend={jax.default_backend()}", file=sys.stderr)
    os.environ.setdefault("WISE_CLIP_DTYPE", "bfloat16")
    config = production_clip_config("ViT-B-32")
    model = CLIP(config)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 224, 224, 3), jnp.float32),
        jnp.zeros((1, config.context_length), jnp.int32),
    )
    params_v = params["params"]["visual"]
    images = jax.random.uniform(jax.random.PRNGKey(1), (B, 224, 224, 3),
                                jnp.float32, -1.8, 1.8)

    # --- accuracy first (small batch, cos vs plain bf16) ----------------
    fwd_bf16 = jax.jit(make_tower(int8=False))
    fwd_int8 = jax.jit(make_tower(int8=True))
    zb = np.asarray(fwd_bf16(params_v, images[:64]))
    zi = np.asarray(fwd_int8(params_v, images[:64]))
    cos = float(np.mean(np.sum(zb * zi, axis=-1)))
    print(f"w8a8 embed cos vs plain bf16: {cos:.6f}")

    # interleaved timing: plain bf16 / w8a8 / production fused / wo-int8
    def mk_step(fwd):
        @jax.jit
        def step(pv, imgs, carry):
            out = fwd(pv, imgs + (carry * 0).astype(imgs.dtype))
            return out[0, 0].astype(jnp.float32)
        return step

    fps_bf16 = time_step(mk_step(make_tower(int8=False)), params_v, images)
    print(f"plain bf16 tower:      {fps_bf16:8.0f} frames/s")
    fps_w8a8 = time_step(mk_step(make_tower(int8=True)), params_v, images)
    print(f"w8a8 tower:            {fps_w8a8:8.0f} frames/s "
          f"({fps_w8a8 / fps_bf16:.3f}x plain)")

    @jax.jit
    def step_prod(params, imgs, carry):
        out = model.apply(params, imgs + (carry * 0).astype(imgs.dtype),
                          method=CLIP.encode_image)
        return out[0, 0].astype(jnp.float32)

    fps_prod = time_step(step_prod, params, images)
    print(f"production fused bf16: {fps_prod:8.0f} frames/s (the bar)")

    qleaves, rebuild = quantize_weight_tree(params)

    @jax.jit
    def step_wo(qleaves, imgs, carry):
        p = rebuild(qleaves)
        out = model.apply(p, imgs + (carry * 0).astype(imgs.dtype),
                          method=CLIP.encode_image)
        return out[0, 0].astype(jnp.float32)

    zq = np.asarray(model.apply(rebuild(qleaves), images[:64],
                                method=CLIP.encode_image))
    zp = np.asarray(model.apply(params, images[:64],
                                method=CLIP.encode_image))
    zq = zq / np.linalg.norm(zq, axis=-1, keepdims=True)
    zp = zp / np.linalg.norm(zp, axis=-1, keepdims=True)
    cos_wo = float(np.mean(np.sum(zq * zp, axis=-1)))
    fps_wo = time_step(step_wo, qleaves, images)
    print(f"weight-only int8:      {fps_wo:8.0f} frames/s "
          f"({fps_wo / fps_prod:.3f}x production), embed cos {cos_wo:.6f}")

    # second interleave pass to bound drift
    fps_bf16b = time_step(mk_step(make_tower(int8=False)), params_v,
                          images)
    fps_w8a8b = time_step(mk_step(make_tower(int8=True)), params_v,
                          images)
    print(f"re-interleave: plain {fps_bf16b:.0f}, w8a8 {fps_w8a8b:.0f} "
          f"({fps_w8a8b / fps_bf16b:.3f}x)")


if __name__ == "__main__":
    main()
