"""Probe: compile + numeric-check fused_attn_block_pooled on the real chip.

Compares the Pallas pooled kernel against plain-XLA math at ViT-B/32
production shapes (B=512, SP=56, D=512, H=8, n_valid=50, pool_row=0)
and the causal text-tower shape. One tiny readback per check.
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

from wise_tpu.ops.block import fused_attn_block_pooled


def xla_pooled(x, ln_s, ln_b, wqkv, bqkv, wo, bo, heads, n_valid,
               pool_row, causal):
    b, sp, d = x.shape
    hd = d // heads
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = jnp.maximum((xf * xf).mean(-1, keepdims=True) - mu * mu, 0.0)
    y = ((xf - mu) * jax.lax.rsqrt(var + 1e-5) * ln_s + ln_b).astype(x.dtype)
    qkv = y @ wqkv + bqkv
    q, k, v = jnp.split(qkv, 3, axis=-1)
    qh = q[:, pool_row].reshape(b, heads, hd)
    kh = k.reshape(b, sp, heads, hd)
    vh = v.reshape(b, sp, heads, hd)
    logits = jnp.einsum("bhd,bkhd->bhk", qh.astype(jnp.float32),
                        kh.astype(jnp.float32)) / np.sqrt(hd)
    col = jnp.arange(sp)[None, None]
    keep = col < n_valid
    if causal:
        keep = keep & (col <= pool_row)
    logits = jnp.where(keep, logits, -jnp.inf)
    p = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    att = jnp.einsum("bhk,bkhd->bhd", p, vh).reshape(b, d)
    return x[:, pool_row] + (att @ wo + bo)


def run(b, sp, d, heads, n_valid, pool_row, causal, label):
    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    bf = jnp.bfloat16
    x = (jax.random.normal(ks[0], (b, sp, d)) * 0.5).astype(bf)
    ln_s = 1.0 + 0.1 * jax.random.normal(ks[1], (d,))
    ln_b = 0.1 * jax.random.normal(ks[2], (d,))
    wqkv = (jax.random.normal(ks[3], (d, 3 * d)) / np.sqrt(d)).astype(bf)
    bqkv = (0.02 * jax.random.normal(ks[4], (3 * d,))).astype(bf)
    wo = (jax.random.normal(ks[5], (d, d)) / np.sqrt(d)).astype(bf)
    bo = (0.02 * jax.random.normal(ks[6], (d,))).astype(bf)
    got = fused_attn_block_pooled(
        x, ln_s, ln_b, wqkv, bqkv, wo, bo, heads=heads, n_valid=n_valid,
        pool_row=pool_row, causal=causal)
    want = jax.jit(xla_pooled, static_argnums=(7, 8, 9, 10))(
        x, ln_s, ln_b, wqkv, bqkv, wo, bo, heads, n_valid, pool_row, causal)
    g = np.asarray(got, np.float32)
    w = np.asarray(want, np.float32)
    gn = g / np.linalg.norm(g, axis=-1, keepdims=True)
    wn = w / np.linalg.norm(w, axis=-1, keepdims=True)
    cos = (gn * wn).sum(-1)
    print(f"{label}: cos min {cos.min():.6f} mean {cos.mean():.6f}")
    assert cos.min() > 0.999, cos.min()


if __name__ == "__main__":
    print("devices:", jax.devices())
    run(512, 56, 768, 12, 50, 0, False, "vit_b32 pooled cls")
    run(256, 80, 512, 8, 77, 76, True, "caption pooled causal last-row")
    run(256, 64, 1024, 16, 64, 63, False, "siglip text pooled last")
    print("OK")
