"""Post-LN (XLM-R) fused block kernels vs plain-ops references.

The kernels (ops/postln_block.py) must reproduce the BertLayer math of
models/clip/hf_text.py: qkv on raw x (no pre-LN), per-example additive
key masks, residual + LayerNorm CLOSING the block, exact (erf) gelu.
Reference: open_clip HFTextEncoder — the text side of the reference's
default backbone (reference extract-features.py:195-207).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _mk(shape, seed, scale=0.02):
    return scale * jax.random.normal(jax.random.PRNGKey(seed), shape)


def _ln(xf, s, b):
    mean = xf.mean(-1, keepdims=True)
    var = jnp.maximum((xf * xf).mean(-1, keepdims=True) - mean * mean, 0.0)
    return (xf - mean) * jax.lax.rsqrt(var + 1e-5) * s + b


def xla_postln_attn(x, km, ln_s, ln_b, wqkv, bqkv, wo, bo, heads):
    b, sp, d = x.shape
    hd = d // heads
    qkv = x @ wqkv + bqkv
    q = qkv[..., :d].reshape(b, sp, heads, hd)
    k = qkv[..., d:2 * d].reshape(b, sp, heads, hd)
    v = qkv[..., 2 * d:].reshape(b, sp, heads, hd)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(hd)
    logits = logits + km[:, :, None, :]
    p = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(x.dtype)
    att = jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(b, sp, d)
    res = (x + att @ wo + bo).astype(jnp.float32)
    return _ln(res, ln_s, ln_b).astype(x.dtype)


def xla_postln_mlp(x, ln_s, ln_b, wfc, bfc, wproj, bproj):
    h = jax.nn.gelu((x @ wfc + bfc).astype(jnp.float32),
                    approximate=False).astype(x.dtype)
    res = (x + h @ wproj + bproj).astype(jnp.float32)
    return _ln(res, ln_s, ln_b).astype(x.dtype)


def _cos_rows(a, b):
    a = np.asarray(a, np.float32).reshape(-1, a.shape[-1])
    b = np.asarray(b, np.float32).reshape(-1, b.shape[-1])
    return (a * b).sum(-1) / (
        np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1) + 1e-30
    )


def _inputs(b=8, sp=24, d=256, seed0=0):
    bf = jnp.bfloat16
    x = _mk((b, sp, d), seed0, 0.5).astype(bf)
    nv = jax.random.randint(jax.random.PRNGKey(seed0 + 9), (b,), 2, sp)
    col = jax.lax.broadcasted_iota(jnp.int32, (b, 1, sp), 2)
    km = jnp.where(col < nv[:, None, None], 0.0, -jnp.inf).astype(
        jnp.float32
    )
    return x, km


def test_postln_attn_block_matches_xla():
    from wise_tpu.ops.postln_block import fused_postln_attn_block

    b, sp, d, heads = 8, 24, 256, 4
    x, km = _inputs(b, sp, d)
    ln_s = 1.0 + _mk((d,), 1)
    ln_b = _mk((d,), 2)
    wqkv = _mk((d, 3 * d), 3).astype(jnp.bfloat16)
    bqkv = _mk((3 * d,), 4).astype(jnp.bfloat16)
    wo = _mk((d, d), 5).astype(jnp.bfloat16)
    bo = _mk((d,), 6).astype(jnp.bfloat16)
    got = fused_postln_attn_block(
        x, km, ln_s, ln_b, wqkv, bqkv, wo, bo, heads=heads,
        interpret=True, group=4,
    )
    want = xla_postln_attn(x, km, ln_s, ln_b, wqkv, bqkv, wo, bo, heads)
    assert got.shape == want.shape and got.dtype == want.dtype
    cos = _cos_rows(got, want)
    assert cos.min() > 0.999, cos.min()


@pytest.mark.parametrize("variant", ["single", "split"])
def test_postln_mlp_block_matches_xla(variant):
    from wise_tpu.ops.postln_block import fused_postln_mlp_block

    b, sp, d = 8, 24, 256
    x, _ = _inputs(b, sp, d, seed0=7)
    ln_s = 1.0 + _mk((d,), 8)
    ln_b = _mk((d,), 9)
    wfc = _mk((d, 4 * d), 10).astype(jnp.bfloat16)
    bfc = _mk((4 * d,), 11).astype(jnp.bfloat16)
    wproj = _mk((4 * d, d), 12).astype(jnp.bfloat16)
    bproj = _mk((d,), 13).astype(jnp.bfloat16)
    got = fused_postln_mlp_block(
        x, ln_s, ln_b, wfc, bfc, wproj, bproj,
        interpret=True, group=4, variant=variant,
    )
    want = xla_postln_mlp(x, ln_s, ln_b, wfc, bfc, wproj, bproj)
    assert got.shape == want.shape and got.dtype == want.dtype
    cos = _cos_rows(got, want)
    assert cos.min() > 0.999, cos.min()


def test_postln_spmd_rules_no_collectives(monkeypatch):
    """dp-sharded x + mask through both spmd wrappers: collective-free."""
    import functools

    from jax.sharding import NamedSharding, PartitionSpec as P

    from wise_tpu.ops import postln_block as PB
    from wise_tpu.parallel.mesh import get_mesh

    monkeypatch.setattr(
        PB, "fused_postln_attn_block",
        functools.partial(PB.fused_postln_attn_block, interpret=True),
    )
    monkeypatch.setattr(
        PB, "fused_postln_mlp_block",
        functools.partial(PB.fused_postln_mlp_block, interpret=True),
    )
    mesh = get_mesh(dp=8)
    b, sp, d, heads = 32, 16, 256, 4
    x, km = _inputs(b, sp, d, seed0=20)
    ln_s = 1.0 + _mk((d,), 21)
    ln_b = _mk((d,), 22)
    wqkv = _mk((d, 3 * d), 23).astype(jnp.bfloat16)
    bqkv = _mk((3 * d,), 24).astype(jnp.bfloat16)
    wo = _mk((d, d), 25).astype(jnp.bfloat16)
    bo = _mk((d,), 26).astype(jnp.bfloat16)
    wfc = _mk((d, 4 * d), 27).astype(jnp.bfloat16)
    bfc = _mk((4 * d,), 28).astype(jnp.bfloat16)
    wproj = _mk((4 * d, d), 29).astype(jnp.bfloat16)
    bproj = _mk((d,), 30).astype(jnp.bfloat16)
    xs = jax.device_put(x, NamedSharding(mesh, P("dp", None, None)))
    kms = jax.device_put(km, NamedSharding(mesh, P("dp", None, None)))

    def f(x, km):
        y = PB.fused_postln_attn_block_spmd(
            x, km, ln_s, ln_b, wqkv, bqkv, wo, bo, heads)
        return PB.fused_postln_mlp_block_spmd(
            y, ln_s, ln_b, wfc, bfc, wproj, bproj, "gelu")

    jf = jax.jit(f)
    hlo = jf.lower(xs, kms).compile().as_text()
    assert "all-gather" not in hlo and "all-reduce" not in hlo
    got = jf(xs, kms)
    want = xla_postln_mlp(
        xla_postln_attn(x, km, ln_s, ln_b, wqkv, bqkv, wo, bo, heads),
        ln_s, ln_b, wfc, bfc, wproj, bproj,
    )
    cos = _cos_rows(got, want)
    assert cos.min() > 0.999, cos.min()


def test_hf_text_tower_fused_matches_plain(monkeypatch):
    """The XLM-R tower with fused post-LN kernels (interpret mode) must
    reproduce the plain-ops tower per example, including varying pad
    lengths; parameter tree identical between paths."""
    import dataclasses
    import functools

    from wise_tpu.models.clip import hf_text as HT
    from wise_tpu.ops import postln_block as PB

    cfg = HT.HFTextConfig(
        vocab_size=128, width=256, layers=2, heads=4, intermediate=1024,
        max_positions=40, embed_dim=64, dtype=jnp.bfloat16,
    )
    tower = HT.XLMRobertaTextTower(cfg)
    toks = np.full((4, 16), cfg.pad_token_id, np.int32)
    rng = np.random.default_rng(0)
    for i, ln in enumerate([3, 16, 1, 9]):
        toks[i, :ln] = rng.integers(2, 127, ln)
    toks = jnp.asarray(toks)
    params = tower.init(jax.random.PRNGKey(0), toks)
    want = tower.apply(params, toks)

    # force the fused path with interpret-mode kernels (CPU)
    monkeypatch.setattr(PB, "supports_fused_postln", lambda *a, **k: True)
    monkeypatch.setattr(
        PB, "fused_postln_attn_block",
        functools.partial(PB.fused_postln_attn_block, interpret=True,
                          group=4),
    )
    monkeypatch.setattr(
        PB, "fused_postln_mlp_block",
        functools.partial(PB.fused_postln_mlp_block, interpret=True,
                          group=4, variant="split"),
    )
    fused_tower = HT.XLMRobertaTextTower(
        dataclasses.replace(cfg, fused_block=True)
    )
    got_params = fused_tower.init(jax.random.PRNGKey(0), toks)
    assert jax.tree_util.tree_structure(got_params) == (
        jax.tree_util.tree_structure(params)
    )
    got = fused_tower.apply(params, toks)
    a = np.asarray(got, np.float32)
    b = np.asarray(want, np.float32)
    cos = (a * b).sum(-1) / (
        np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1)
    )
    assert cos.min() > 0.999, cos.min()
