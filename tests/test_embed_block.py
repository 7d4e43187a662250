"""Parity for the embed-fold kernel (ops/embed_block.py).

The kernel is a measured NEGATIVE at ViT-B/32 shapes and is not wired
into the model (module docstring has the numbers); these tests keep the
reference implementation correct for shapes where the trade may flip.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wise_tpu.ops.embed_block import (
    _CALIBRATED_EMBED,
    fused_embed_attn_block,
    plain_embed_attn,
    supports_embed_fold,
)


def _inputs(b=4, sp=16, pd=48, d=128, heads=2, nv=13, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 6)
    xp = jax.random.normal(ks[0], (b, sp, pd), jnp.bfloat16)
    xp = xp.at[:, 0].set(0).at[:, nv:].set(0)
    kern = jax.random.normal(ks[1], (pd, d), jnp.bfloat16) * 0.05
    posc = jax.random.normal(ks[2], (sp, d), jnp.float32) * 0.05
    posc = posc.at[nv:].set(0)
    lnp_s = 1.0 + 0.1 * jax.random.normal(ks[3], (d,), jnp.float32)
    lnp_b = 0.1 * jax.random.normal(ks[4], (d,), jnp.float32)
    ln_s = jnp.ones((d,), jnp.float32)
    ln_b = jnp.zeros((d,), jnp.float32)
    wqkv = jax.random.normal(ks[5], (d, 3 * d), jnp.bfloat16) * 0.05
    bqkv = jnp.zeros((3 * d,), jnp.bfloat16)
    wo = jax.random.normal(ks[0], (d, d), jnp.bfloat16) * 0.05
    bo = jnp.zeros((d,), jnp.bfloat16)
    return (xp, kern, posc, lnp_s, lnp_b, ln_s, ln_b, wqkv, bqkv, wo, bo,
            heads, nv)


@pytest.mark.parametrize("bf16_out", [False, True])
def test_embed_fold_matches_plain(bf16_out):
    *args, heads, nv = _inputs()
    got = fused_embed_attn_block(
        *args, heads=heads, n_valid=nv, bf16_out=bf16_out,
        interpret=True, group=2,
    )
    want = plain_embed_attn(*args, heads=heads, n_valid=nv,
                            bf16_out=bf16_out)
    assert got.dtype == want.dtype
    np.testing.assert_allclose(
        np.asarray(got[:, :nv], np.float32),
        np.asarray(want[:, :nv], np.float32),
        atol=5e-2 if bf16_out else 2e-2, rtol=0,
    )


def test_supports_gate_requires_calibration():
    # empty calibration table -> never engages (the measured negative)
    assert _CALIBRATED_EMBED == {}
    assert not supports_embed_fold(512, 56, 768, 12, jnp.bfloat16)
    # even with an entry, non-bf16 and non-64 head_dim stay off
    _CALIBRATED_EMBED[(56, 768)] = 2
    try:
        assert supports_embed_fold(512, 56, 768, 12, jnp.bfloat16)
        assert not supports_embed_fold(511, 56, 768, 12, jnp.bfloat16)
        assert not supports_embed_fold(512, 56, 768, 12, jnp.float32)
        assert not supports_embed_fold(512, 56, 768, 16, jnp.bfloat16)
    finally:
        _CALIBRATED_EMBED.clear()
