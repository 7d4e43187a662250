"""Fused Swin window attention (ops/swin_attention.py) vs the XLA module,
including the relative-position bias and the shifted-window mask, plus the
model-level env-gated path."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def _cos_rows(a, b):
    a = np.asarray(a, np.float32).reshape(-1, a.shape[-1])
    b = np.asarray(b, np.float32).reshape(-1, b.shape[-1])
    num = (a * b).sum(-1)
    den = np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1) + 1e-30
    return num / den


@pytest.mark.parametrize("masked", [False, True])
def test_kernel_matches_window_attention_module(masked):
    from wise_tpu.models.clap.model import WindowAttention, _shift_attn_mask
    from wise_tpu.ops.swin_attention import fused_window_attention

    window, c, heads = 4, 96, 4
    hres = wres = 16
    n_win = (hres // window) * (wres // window)   # 16
    b = 2
    n, l = b * n_win, window * window
    x = (0.5 * jax.random.normal(jax.random.PRNGKey(0), (n, l, c))).astype(
        jnp.bfloat16
    )
    mask = (
        jnp.asarray(_shift_attn_mask(hres, wres, window, window // 2))
        if masked else None
    )

    wa = WindowAttention(c, heads, window, dtype=jnp.bfloat16)
    params = wa.init(jax.random.PRNGKey(1), x, mask)
    want = wa.apply(params, x, mask)

    p = params["params"]
    got = fused_window_attention(
        x,
        p["qkv"]["kernel"].astype(jnp.bfloat16),
        p["qkv"]["bias"].astype(jnp.bfloat16),
        p["proj"]["kernel"].astype(jnp.bfloat16),
        p["proj"]["bias"].astype(jnp.bfloat16),
        _bias_tensor(p["relative_position_bias_table"], window, l, heads),
        mask, heads=heads, interpret=True,
    )
    cos = _cos_rows(got, want)
    assert cos.min() > 0.999, cos.min()


def _bias_tensor(table, window, l, heads):
    from wise_tpu.models.clap.model import _relative_position_index

    idx = _relative_position_index(window)
    return jnp.transpose(
        jnp.asarray(table)[idx.reshape(-1)].reshape(l, l, heads), (2, 0, 1)
    )


def test_model_env_gated_path(monkeypatch):
    """WISE_FUSED_SWIN=1: the module takes the fused branch (patched to
    interpret mode) and matches the XLA branch; the param tree is shared."""
    import functools

    from wise_tpu.models.clap.model import WindowAttention, _shift_attn_mask
    from wise_tpu.ops import swin_attention as SA

    monkeypatch.setenv("WISE_FUSED_SWIN", "1")
    monkeypatch.setattr(
        SA, "supports_fused_swin",
        lambda *a: jnp.dtype(a[-1]) == jnp.bfloat16,
    )
    monkeypatch.setattr(
        SA, "fused_window_attention",
        functools.partial(SA.fused_window_attention, interpret=True),
    )
    # the model imports symbols at call time from the module, so the
    # monkeypatches take effect
    import wise_tpu.models.clap.model as M

    window, c, heads = 4, 96, 4
    n_win, b = 16, 2
    l = window * window
    x = (0.5 * jax.random.normal(jax.random.PRNGKey(2),
                                 (b * n_win, l, c))).astype(jnp.bfloat16)
    mask = jnp.asarray(_shift_attn_mask(16, 16, window, 2))
    wa = M.WindowAttention(c, heads, window, dtype=jnp.bfloat16)
    params_fused = wa.init(jax.random.PRNGKey(1), x, mask)
    got = wa.apply(params_fused, x, mask)

    monkeypatch.setenv("WISE_FUSED_SWIN", "0")
    params_xla = wa.init(jax.random.PRNGKey(1), x, mask)
    assert jax.tree_util.tree_structure(
        params_fused
    ) == jax.tree_util.tree_structure(params_xla)
    want = wa.apply(params_xla, x, mask)
    cos = _cos_rows(got, want)
    assert cos.min() > 0.999, cos.min()


# ---------------------------------------------------------------------------
# Whole-Swin-block kernel (ops/swin_block.py)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("shift", [0, 2])
def test_swin_block_kernel_matches_module(shift, monkeypatch):
    """fused_swin_block (interpret mode) == the XLA SwinBlock, including
    the layout round-trip (roll/partition/reverse), the relative-position
    bias, the shift mask, and both residuals. Same param tree."""
    import functools

    import wise_tpu.ops.swin_block as SB
    from wise_tpu.models.clap.model import SwinBlock

    window, c, heads = 4, 96, 4
    hres = wres = 16
    b, l = 2, hres * wres
    x = (0.5 * jax.random.normal(jax.random.PRNGKey(0), (b, l, c))).astype(
        jnp.bfloat16
    )

    monkeypatch.setenv("WISE_FUSED_SWIN_BLOCK", "0")
    monkeypatch.setenv("WISE_FUSED_SWIN", "0")
    blk = SwinBlock(c, heads, window, shift, (hres, wres),
                    dtype=jnp.bfloat16)
    params = blk.init(jax.random.PRNGKey(1), x)
    want = blk.apply(params, x)

    monkeypatch.setenv("WISE_FUSED_SWIN_BLOCK", "1")
    monkeypatch.setattr(
        SB, "supports_fused_swin_block", lambda *a: True
    )
    monkeypatch.setattr(
        SB, "fused_swin_block",
        functools.partial(SB.fused_swin_block, interpret=True),
    )
    params_fused = blk.init(jax.random.PRNGKey(1), x)
    assert jax.tree_util.tree_structure(
        params_fused
    ) == jax.tree_util.tree_structure(params)
    engaged = SB.engaged_traces
    got = blk.apply(params_fused, x)
    assert SB.engaged_traces > engaged
    cos = _cos_rows(got, want)
    assert cos.min() > 0.999, cos.min()


def test_swin_block_group_respects_mask_period():
    """The group must divide the window batch and be compatible with the
    mask period so the grid-blocked mask lands on the right windows."""
    from wise_tpu.ops.swin_block import swin_block_group

    g = swin_block_group(2048, 64, 96, 4, 64, 384)
    assert g is not None and 2048 % g == 0 and (64 % g == 0 or g % 64 == 0)
    # unmasked: only batch divisibility constrains
    g = swin_block_group(96, 64, 96, 4, None, 384)
    assert g is not None and 96 % g == 0


def test_htsat_tower_fused_block_parity(monkeypatch):
    """Tiny HTSAT config end-to-end: fused whole-block path (interpret)
    vs the pure-XLA tower; embeddings match and checkpoints interop."""
    import dataclasses
    import functools

    import wise_tpu.ops.swin_block as SB
    from wise_tpu.models.clap.model import CLAPConfig, HTSATEncoder

    cfg = dataclasses.replace(
        CLAPConfig(), spec_frames=128, freq_ratio=4, n_mels=16,
        embed_dim=16, depths=(2, 1), num_heads=(2, 2), window_size=4,
        dtype=jnp.bfloat16,
    )
    mel = 0.5 * jax.random.normal(jax.random.PRNGKey(0), (2, 128, 16))

    monkeypatch.setenv("WISE_FUSED_SWIN_BLOCK", "0")
    monkeypatch.setenv("WISE_FUSED_SWIN", "0")
    enc = HTSATEncoder(cfg)
    params = enc.init(jax.random.PRNGKey(1), mel)
    want = enc.apply(params, mel)

    monkeypatch.setenv("WISE_FUSED_SWIN_BLOCK", "1")
    monkeypatch.setattr(SB, "supports_fused_swin_block", lambda *a: True)
    monkeypatch.setattr(
        SB, "fused_swin_block",
        functools.partial(SB.fused_swin_block, interpret=True),
    )
    got = enc.apply(params, mel)  # SAME params: checkpoint interop
    cos = _cos_rows(got, want)
    assert cos.min() > 0.999, cos.min()


@pytest.mark.parametrize("flat", [False, True])
@pytest.mark.parametrize("group,n_win", [(8, 4), (3, 9)])
def test_swin_block_kernel_mask_group_interplay(group, n_win, flat):
    """The shift mask varies within the window batch with period n_win.
    Exercise BOTH plumbing branches of fused_swin_block: group > n_win
    (mask tiled up to the group) and n_win > group (mask riding the grid
    via the i % period index map), against a direct jnp reference."""
    from wise_tpu.models.clap.model import (
        _relative_position_index,
        _shift_attn_mask,
    )
    from wise_tpu.ops.swin_block import fused_swin_block

    window, c, heads = 4, 32, 2
    L = window * window
    res = {4: 8, 9: 12}[n_win]          # (res/window)^2 == n_win
    assert (res // window) ** 2 == n_win
    b = 2
    n = b * n_win
    ff = 2 * c
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 6)
    x = (0.5 * jax.random.normal(ks[0], (n, L, c))).astype(jnp.bfloat16)
    wqkv = (0.1 * jax.random.normal(ks[1], (c, 3 * c))).astype(jnp.bfloat16)
    wo = (0.1 * jax.random.normal(ks[2], (c, c))).astype(jnp.bfloat16)
    wfc = (0.1 * jax.random.normal(ks[3], (c, ff))).astype(jnp.bfloat16)
    wproj = (0.1 * jax.random.normal(ks[4], (ff, c))).astype(jnp.bfloat16)
    table = 0.1 * jax.random.normal(ks[5], ((2 * window - 1) ** 2, heads))
    idx = _relative_position_index(window)
    bias = jnp.transpose(table[idx.reshape(-1)].reshape(L, L, heads),
                         (2, 0, 1))
    mask = jnp.asarray(_shift_attn_mask(res, res, window, window // 2))
    assert mask.shape[0] == n_win
    ones, zeros = jnp.ones((c,), jnp.float32), jnp.zeros((c,), jnp.float32)

    got = fused_swin_block(
        x, ones, zeros, wqkv, jnp.zeros((3 * c,)), wo, zeros, bias, mask,
        ones, zeros, wfc, jnp.zeros((ff,)), wproj, zeros,
        heads=heads, group=group, interpret=True, flat=flat,
    )

    # direct jnp reference on the same window-layout tensors
    def ln(v):
        m = v.mean(-1, keepdims=True)
        return (v - m) / jnp.sqrt(v.var(-1, keepdims=True) + 1e-5)

    xf = x.astype(jnp.float32)
    y = ln(xf)
    qkv = y @ wqkv.astype(jnp.float32)
    q, k, v = jnp.split(qkv.reshape(n, L, 3, heads, c // heads)
                        .transpose(2, 0, 3, 1, 4), 3)
    q, k, v = q[0], k[0], v[0]          # (n, heads, L, hd)
    logits = q @ k.transpose(0, 1, 3, 2) / np.sqrt(c // heads)
    logits = logits + bias[None]
    logits = logits + jnp.tile(mask[:, None], (b, 1, 1, 1))
    p = jax.nn.softmax(logits, axis=-1)
    att = (p @ v).transpose(0, 2, 1, 3).reshape(n, L, c)
    o = xf + att @ wo.astype(jnp.float32)
    h = jax.nn.gelu(ln(o) @ wfc.astype(jnp.float32), approximate=False)
    want = o + h @ wproj.astype(jnp.float32)

    cos = _cos_rows(got, want)
    assert cos.min() > 0.999, cos.min()
