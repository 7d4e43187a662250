"""Fused transformer-block kernels (ops/block.py) vs the XLA block path.

The reference semantics are exactly ResidualAttentionBlock's
(models/clip/model.py): f32 LayerNorm (flax stats), bf16 GEMMs with f32
accumulation, f32 softmax, residual adds in bf16. Interpret mode runs the
kernels on CPU; tolerances reflect bf16 rounding-point differences between
the fused and XLA orderings (cos >= 0.999 per token, matching the
round-2 fused-attention acceptance bar)."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def _mk(shape, key, scale=0.02):
    return scale * jax.random.normal(jax.random.PRNGKey(key), shape,
                                     dtype=jnp.float32)


def xla_attn_block(x, ln_s, ln_b, wqkv, bqkv, wo, bo, heads, n_valid,
                   causal):
    from wise_tpu.ops.attention import xla_attention

    b, sp, d = x.shape
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = jnp.maximum((xf * xf).mean(-1, keepdims=True) - mean * mean, 0.0)
    y = ((xf - mean) * jax.lax.rsqrt(var + 1e-5) * ln_s + ln_b).astype(
        x.dtype
    )
    qkv = y @ wqkv.astype(x.dtype) + bqkv.astype(x.dtype)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, sp), 3)
    mask = jnp.where(col < n_valid, 0.0, -jnp.inf)
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, (1, 1, sp, sp), 2)
        colq = jax.lax.broadcasted_iota(jnp.int32, (1, 1, sp, sp), 3)
        mask = mask + jnp.where(colq <= row, 0.0, -jnp.inf)
    att = xla_attention(q, k, v, heads=heads, mask=mask, softmax_f32=True,
                        out_dtype=x.dtype)
    return x + (att @ wo.astype(x.dtype) + bo.astype(x.dtype))


def xla_mlp_block(x, ln_s, ln_b, wfc, bfc, wproj, bproj, act):
    from wise_tpu.ops.block import _gelu_f32

    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = jnp.maximum((xf * xf).mean(-1, keepdims=True) - mean * mean, 0.0)
    y = ((xf - mean) * jax.lax.rsqrt(var + 1e-5) * ln_s + ln_b).astype(
        x.dtype
    )
    h = y @ wfc.astype(x.dtype) + bfc.astype(x.dtype)
    h = _gelu_f32(h.astype(jnp.float32), act).astype(x.dtype)
    return x + (h @ wproj.astype(x.dtype) + bproj.astype(x.dtype))


def _cos_rows(a, b):
    a = np.asarray(a, np.float32).reshape(-1, a.shape[-1])
    b = np.asarray(b, np.float32).reshape(-1, b.shape[-1])
    num = (a * b).sum(-1)
    den = np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1) + 1e-30
    return num / den


@pytest.mark.parametrize("flat", [False, True])
@pytest.mark.parametrize("causal", [False, True])
def test_attn_block_matches_xla(causal, flat):
    from wise_tpu.ops.block import fused_attn_block

    b, sp, d, heads, n_valid = 8, 56, 256, 4, 50
    x = _mk((b, sp, d), 0, 1.0).astype(jnp.bfloat16)
    ln_s = 1.0 + _mk((d,), 1)
    ln_b = _mk((d,), 2)
    wqkv, bqkv = _mk((d, 3 * d), 3), _mk((3 * d,), 4)
    wo, bo = _mk((d, d), 5), _mk((d,), 6)
    got = fused_attn_block(
        x, ln_s, ln_b, wqkv.astype(jnp.bfloat16), bqkv.astype(jnp.bfloat16),
        wo.astype(jnp.bfloat16), bo.astype(jnp.bfloat16),
        heads=heads, n_valid=n_valid, causal=causal, interpret=True,
        flat=flat,
    )
    want = xla_attn_block(x, ln_s, ln_b, wqkv, bqkv, wo, bo, heads,
                          n_valid, causal)
    assert got.shape == want.shape and got.dtype == want.dtype
    cos = _cos_rows(got[:, :n_valid], want[:, :n_valid])
    assert cos.min() > 0.999, cos.min()


@pytest.mark.parametrize("pool_row", [0, 5])
@pytest.mark.parametrize("causal", [False, True])
def test_attn_block_pooled_matches_xla(causal, pool_row):
    """Pooled last-layer variant: its (B, D) output must equal the full
    block's output at the pooled row (q/out-proj restricted to that row,
    k/v full — same contractions for the surviving row)."""
    from wise_tpu.ops.block import fused_attn_block_pooled

    b, sp, d, heads, n_valid = 8, 56, 256, 4, 50
    x = _mk((b, sp, d), 60, 1.0).astype(jnp.bfloat16)
    ln_s = 1.0 + _mk((d,), 61)
    ln_b = _mk((d,), 62)
    wqkv, bqkv = _mk((d, 3 * d), 63), _mk((3 * d,), 64)
    wo, bo = _mk((d, d), 65), _mk((d,), 66)
    got = fused_attn_block_pooled(
        x, ln_s, ln_b, wqkv.astype(jnp.bfloat16), bqkv.astype(jnp.bfloat16),
        wo.astype(jnp.bfloat16), bo.astype(jnp.bfloat16),
        heads=heads, n_valid=n_valid, pool_row=pool_row, causal=causal,
        interpret=True,
    )
    want = xla_attn_block(x, ln_s, ln_b, wqkv, bqkv, wo, bo, heads,
                          n_valid, causal)[:, pool_row]
    assert got.shape == (b, d) and got.dtype == want.dtype
    cos = _cos_rows(got, want)
    assert cos.min() > 0.999, cos.min()


@pytest.mark.parametrize("b", [16, 64])
def test_pooled_spmd_rule_no_collectives(monkeypatch, b):
    """dp-sharded x through the pooled block: collective-free, (B, D) out.
    b=16 -> per-shard batch 2 exercises the plain-ops fallback (below the
    kernel's 8-sublane output minimum); b=64 -> per-shard 8 runs the
    interpret-mode kernel."""
    import functools

    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from wise_tpu.ops import block as Bk
    from wise_tpu.parallel.mesh import get_mesh

    monkeypatch.setattr(
        Bk, "fused_attn_block_pooled",
        functools.partial(Bk.fused_attn_block_pooled, interpret=True),
    )
    mesh = get_mesh(dp=8)
    sp, d, heads, n_valid = 16, 256, 4, 13
    x = _mk((b, sp, d), 70, 1.0).astype(jnp.bfloat16)
    ln_s = 1.0 + _mk((d,), 71)
    ln_b = _mk((d,), 72)
    wqkv, bqkv = _mk((d, 3 * d), 73), _mk((3 * d,), 74)
    wo, bo = _mk((d, d), 75), _mk((d,), 76)
    bf = jnp.bfloat16
    xs = jax.device_put(x, NamedSharding(mesh, P("dp", None, None)))
    jf = jax.jit(lambda x: Bk.fused_attn_block_pooled_spmd(
        x, ln_s, ln_b, wqkv.astype(bf), bqkv.astype(bf),
        wo.astype(bf), bo.astype(bf), heads, n_valid, 0, False,
    ))
    hlo = jf.lower(xs).compile().as_text()
    assert "all-gather" not in hlo and "all-reduce" not in hlo
    got = jf(xs)
    want = xla_attn_block(x, ln_s, ln_b, wqkv, bqkv, wo, bo, heads,
                          n_valid, False)[:, 0]
    cos = _cos_rows(got, want)
    assert cos.min() > 0.999, cos.min()


@pytest.mark.parametrize("causal", [False, True])
def test_attn_block_pooled_dyn_matches_xla(causal):
    """Dynamic-row pooled variant: each example's (B, D) output must equal
    the full block's output at that example's own row (the one-hot MXU
    gather + additive mask path, interpret mode)."""
    from wise_tpu.ops.block import fused_attn_block_pooled_dyn

    b, sp, d, heads, n_valid = 8, 56, 256, 4, 50
    x = _mk((b, sp, d), 80, 1.0).astype(jnp.bfloat16)
    ln_s = 1.0 + _mk((d,), 81)
    ln_b = _mk((d,), 82)
    wqkv, bqkv = _mk((d, 3 * d), 83), _mk((3 * d,), 84)
    wo, bo = _mk((d, d), 85), _mk((d,), 86)
    rows = jnp.array([0, 5, 49, 12, 1, 33, 49, 7], jnp.int32)
    got = fused_attn_block_pooled_dyn(
        x, rows, ln_s, ln_b,
        wqkv.astype(jnp.bfloat16), bqkv.astype(jnp.bfloat16),
        wo.astype(jnp.bfloat16), bo.astype(jnp.bfloat16),
        heads=heads, n_valid=n_valid, causal=causal,
        interpret=True, group=8,
    )
    full = xla_attn_block(x, ln_s, ln_b, wqkv, bqkv, wo, bo, heads,
                          n_valid, causal)
    want = jnp.take_along_axis(full, rows[:, None, None], axis=1)[:, 0]
    assert got.shape == (b, d) and got.dtype == want.dtype
    cos = _cos_rows(got, want)
    assert cos.min() > 0.999, cos.min()


@pytest.mark.parametrize("causal", [False, True])
def test_pooled_dyn_xla_fallback_matches_full(causal):
    """The plain-ops dynamic-row fallback (group=None shapes) must also
    reproduce the full block at each example's row."""
    from wise_tpu.ops.block import _pooled_block_xla_dyn

    b, sp, d, heads, n_valid = 6, 24, 128, 2, 20
    x = _mk((b, sp, d), 87, 1.0).astype(jnp.bfloat16)
    ln_s = 1.0 + _mk((d,), 88)
    ln_b = _mk((d,), 89)
    wqkv, bqkv = _mk((d, 3 * d), 90), _mk((3 * d,), 91)
    wo, bo = _mk((d, d), 92), _mk((d,), 93)
    rows = jnp.array([3, 0, 19, 11, 7, 19], jnp.int32)
    got = _pooled_block_xla_dyn(
        x, rows, ln_s, ln_b,
        wqkv.astype(jnp.bfloat16), bqkv.astype(jnp.bfloat16),
        wo.astype(jnp.bfloat16), bo.astype(jnp.bfloat16),
        heads, n_valid, causal,
    )
    full = xla_attn_block(x, ln_s, ln_b, wqkv, bqkv, wo, bo, heads,
                          n_valid, causal)
    want = jnp.take_along_axis(full, rows[:, None, None], axis=1)[:, 0]
    cos = _cos_rows(got, want)
    assert cos.min() > 0.999, cos.min()


@pytest.mark.parametrize("b", [16, 64])
def test_pooled_dyn_spmd_rule_no_collectives(monkeypatch, b):
    """dp-sharded x + rows through the dynamic pooled block: collective-
    free, (B, D) out. b=16 -> per-shard 2 exercises the plain-ops
    fallback; b=64 -> per-shard 8 runs the interpret-mode kernel."""
    import functools

    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from wise_tpu.ops import block as Bk
    from wise_tpu.parallel.mesh import get_mesh

    monkeypatch.setattr(
        Bk, "fused_attn_block_pooled_dyn",
        functools.partial(Bk.fused_attn_block_pooled_dyn, interpret=True),
    )
    mesh = get_mesh(dp=8)
    sp, d, heads, n_valid = 16, 256, 4, 13
    x = _mk((b, sp, d), 94, 1.0).astype(jnp.bfloat16)
    rows = jax.random.randint(jax.random.PRNGKey(95), (b,), 0, n_valid)
    ln_s = 1.0 + _mk((d,), 96)
    ln_b = _mk((d,), 97)
    wqkv, bqkv = _mk((d, 3 * d), 98), _mk((3 * d,), 99)
    wo, bo = _mk((d, d), 100), _mk((d,), 101)
    bf = jnp.bfloat16
    xs = jax.device_put(x, NamedSharding(mesh, P("dp", None, None)))
    rs = jax.device_put(rows.astype(jnp.int32),
                        NamedSharding(mesh, P("dp")))
    jf = jax.jit(lambda x, r: Bk.fused_attn_block_pooled_dyn_spmd(
        x, r, ln_s, ln_b, wqkv.astype(bf), bqkv.astype(bf),
        wo.astype(bf), bo.astype(bf), heads, n_valid, True,
    ))
    hlo = jf.lower(xs, rs).compile().as_text()
    assert "all-gather" not in hlo and "all-reduce" not in hlo
    got = jf(xs, rs)
    full = xla_attn_block(x, ln_s, ln_b, wqkv, bqkv, wo, bo, heads,
                          n_valid, True)
    want = jnp.take_along_axis(full, rows[:, None, None], axis=1)[:, 0]
    cos = _cos_rows(got, want)
    assert cos.min() > 0.999, cos.min()


@pytest.mark.parametrize("flat", [False, True])
@pytest.mark.parametrize("act", ["gelu", "quick_gelu", "gelu_tanh"])
def test_mlp_block_matches_xla(act, flat):
    from wise_tpu.ops.block import fused_mlp_block

    b, sp, d = 8, 56, 256
    x = _mk((b, sp, d), 10, 1.0).astype(jnp.bfloat16)
    ln_s = 1.0 + _mk((d,), 11)
    ln_b = _mk((d,), 12)
    wfc, bfc = _mk((d, 4 * d), 13), _mk((4 * d,), 14)
    wproj, bproj = _mk((4 * d, d), 15), _mk((d,), 16)
    got = fused_mlp_block(
        x, ln_s, ln_b, wfc.astype(jnp.bfloat16), bfc.astype(jnp.bfloat16),
        wproj.astype(jnp.bfloat16), bproj.astype(jnp.bfloat16),
        act=act, interpret=True, flat=flat,
    )
    want = xla_mlp_block(x, ln_s, ln_b, wfc, bfc, wproj, bproj, act)
    assert got.shape == want.shape and got.dtype == want.dtype
    cos = _cos_rows(got, want)
    assert cos.min() > 0.999, cos.min()


def test_group_pickers():
    from wise_tpu.ops.block import _attn_group, _mlp_group

    # ViT-B/32 step shapes must admit a group of at least 2
    assert (_attn_group(512, 56, 768) or 0) >= 2
    assert (_mlp_group(512, 56, 768) or 0) >= 1
    # CLIP text tower
    assert (_attn_group(256, 80, 512) or 0) >= 2
    assert (_mlp_group(256, 80, 512) or 0) >= 2


def test_spmd_rule_no_collectives(monkeypatch):
    """Under GSPMD with dp-sharded x, the block kernels run per shard —
    compiled module is collective-free and matches the XLA blocks."""
    import functools

    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from wise_tpu.ops import block as Bk
    from wise_tpu.parallel.mesh import get_mesh

    monkeypatch.setattr(
        Bk, "fused_attn_block",
        functools.partial(Bk.fused_attn_block, interpret=True),
    )
    monkeypatch.setattr(
        Bk, "fused_mlp_block",
        functools.partial(Bk.fused_mlp_block, interpret=True),
    )
    mesh = get_mesh(dp=8)
    b, sp, d, heads, n_valid = 16, 16, 256, 4, 13
    x = _mk((b, sp, d), 30, 1.0).astype(jnp.bfloat16)
    ln_s = 1.0 + _mk((d,), 31)
    ln_b = _mk((d,), 32)
    wqkv, bqkv = _mk((d, 3 * d), 33), _mk((3 * d,), 34)
    wo, bo = _mk((d, d), 35), _mk((d,), 36)
    wfc, bfc = _mk((d, 4 * d), 37), _mk((4 * d,), 38)
    wproj, bproj = _mk((4 * d, d), 39), _mk((d,), 40)
    bf = jnp.bfloat16
    xs = jax.device_put(x, NamedSharding(mesh, P("dp", None, None)))

    def f(x):
        y = Bk.fused_attn_block_spmd(
            x, ln_s, ln_b, wqkv.astype(bf), bqkv.astype(bf),
            wo.astype(bf), bo.astype(bf), heads, n_valid, False,
        )
        return Bk.fused_mlp_block_spmd(
            y, ln_s, ln_b, wfc.astype(bf), bfc.astype(bf),
            wproj.astype(bf), bproj.astype(bf), "gelu",
        )

    jf = jax.jit(f)
    hlo = jf.lower(xs).compile().as_text()
    assert "all-gather" not in hlo and "all-reduce" not in hlo
    got = jf(xs)
    want = xla_mlp_block(
        xla_attn_block(x, ln_s, ln_b, wqkv, bqkv, wo, bo, heads, n_valid,
                       False),
        ln_s, ln_b, wfc, bfc, wproj, bproj, "gelu",
    )
    cos = _cos_rows(got[:, :n_valid], want[:, :n_valid])
    assert cos.min() > 0.999, cos.min()


@pytest.mark.parametrize("flat", [False, True])
@pytest.mark.parametrize("act", ["gelu", "quick_gelu"])
def test_mlp_split_matches_xla(act, flat):
    from wise_tpu.ops.block import fused_mlp_split

    b, sp, d = 8, 56, 256
    x = _mk((b, sp, d), 50, 1.0).astype(jnp.bfloat16)
    ln_s = 1.0 + _mk((d,), 51)
    ln_b = _mk((d,), 52)
    wfc, bfc = _mk((d, 4 * d), 53), _mk((4 * d,), 54)
    wproj, bproj = _mk((4 * d, d), 55), _mk((d,), 56)
    got = fused_mlp_split(
        x, ln_s, ln_b, wfc.astype(jnp.bfloat16), bfc.astype(jnp.bfloat16),
        wproj.astype(jnp.bfloat16), bproj.astype(jnp.bfloat16),
        act=act, interpret=True, flat=flat,
    )
    want = xla_mlp_block(x, ln_s, ln_b, wfc, bfc, wproj, bproj, act)
    cos = _cos_rows(got, want)
    assert cos.min() > 0.999, cos.min()


@pytest.mark.parametrize("causal", [False, True])
def test_attn_block_padded_matches_xla(causal):
    """Padded-head decomposition (head_dim 80 — the ViT-H class, the
    reference's default extract-features backbone) against the XLA block:
    zero-padded 128-lane head slots must be numerically invisible."""
    from wise_tpu.ops.block import fused_attn_block_padded

    b, sp, d, heads, n_valid = 4, 16, 160, 2, 13  # head_dim 80
    x = _mk((b, sp, d), 20, 1.0).astype(jnp.bfloat16)
    ln_s = 1.0 + _mk((d,), 21)
    ln_b = _mk((d,), 22)
    wqkv, bqkv = _mk((d, 3 * d), 23), _mk((3 * d,), 24)
    wo, bo = _mk((d, d), 25), _mk((d,), 26)
    got = fused_attn_block_padded(
        x, ln_s, ln_b, wqkv.astype(jnp.bfloat16), bqkv.astype(jnp.bfloat16),
        wo.astype(jnp.bfloat16), bo.astype(jnp.bfloat16),
        heads=heads, n_valid=n_valid, causal=causal, interpret=True,
        groups=(1, 1),
    )
    want = xla_attn_block(x, ln_s, ln_b, wqkv, bqkv, wo, bo, heads,
                          n_valid, causal)
    assert got.shape == want.shape and got.dtype == want.dtype
    cos = _cos_rows(got[:, :n_valid], want[:, :n_valid])
    assert cos.min() > 0.999, cos.min()


def test_padded_gate_requires_calibration():
    """supports_fused_block_padded only opens for hardware-calibrated
    (seq_pad, width) shapes with a non-lane-aligned head dim."""
    from wise_tpu.ops import block

    assert not block.supports_fused_block_padded(
        128, 264, 1280, 16, jnp.bfloat16
    )  # not calibrated yet (populated by hardware probes)
    try:
        block._CALIBRATED_PAD[(264, 1280)] = (1, 1)
        # still requires TPU backend + a kernel MLP choice on this shape
        res = block.supports_fused_block_padded(
            128, 264, 1280, 16, jnp.bfloat16
        )
        assert isinstance(res, bool)
        # head_dim 64 shapes never take the padded path
        block._CALIBRATED_PAD[(56, 768)] = (1, 1)
        assert not block.supports_fused_block_padded(
            512, 56, 768, 12, jnp.bfloat16
        )
    finally:
        block._CALIBRATED_PAD.pop((264, 1280), None)
        block._CALIBRATED_PAD.pop((56, 768), None)
