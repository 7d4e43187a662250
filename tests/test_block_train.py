"""Trainable fused-block kernels: custom-VJP wrappers (ops/block.py).

custom_partitioning has no autodiff rule, so before these wrappers a train
step over a fused_block=True tower failed to trace. The wrappers run the
Pallas kernel forward and differentiate a plain-ops reference of the same
math in the backward (recompute, remat-style). These tests check, on CPU
with interpret-mode kernels:

  (a) kernel-level: grads of the trainable wrappers match jax.grad of the
      plain reference (the kernel forward only changes bf16 rounding
      points, so cotangents agree to bf16 tolerance);
  (b) model-level: a full CLIP contrastive loss differentiates with
      fused_block=True forced on, and the per-leaf gradients match the
      XLA-path model's gradients (same parameter tree).
"""

import functools
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


def _cos(a, b):
    a = np.asarray(a, np.float32).ravel()
    b = np.asarray(b, np.float32).ravel()
    na, nb = np.linalg.norm(a), np.linalg.norm(b)
    if na == 0.0 and nb == 0.0:
        return 1.0
    return float(a @ b / (na * nb + 1e-30))


@pytest.fixture
def interpret_kernels(monkeypatch):
    from wise_tpu.ops import block

    monkeypatch.setattr(
        block, "fused_attn_block",
        functools.partial(block.fused_attn_block, interpret=True),
    )
    monkeypatch.setattr(
        block, "fused_mlp_block",
        functools.partial(block.fused_mlp_block, interpret=True),
    )
    monkeypatch.setattr(
        block, "fused_mlp_split",
        functools.partial(block.fused_mlp_split, interpret=True),
    )
    monkeypatch.setattr(
        block, "fused_attn_block_pooled",
        functools.partial(block.fused_attn_block_pooled, interpret=True),
    )
    monkeypatch.setattr(
        block, "fused_attn_block_pooled_dyn",
        functools.partial(block.fused_attn_block_pooled_dyn,
                          interpret=True),
    )
    # saved-activation forward variants (the _train wrappers' vjp path)
    monkeypatch.setattr(
        block, "fused_attn_block_res",
        functools.partial(block.fused_attn_block_res, interpret=True),
    )
    monkeypatch.setattr(
        block, "fused_mlp_block_res",
        functools.partial(block.fused_mlp_block_res, interpret=True),
    )
    monkeypatch.setattr(
        block, "fused_mlp_split_res",
        functools.partial(block.fused_mlp_split_res, interpret=True),
    )


@pytest.mark.parametrize("causal", [False, True])
def test_attn_block_train_grads_match_reference(interpret_kernels, causal):
    from wise_tpu.ops.block import fused_attn_block_train, plain_attn_block

    b, sp, d, heads, n_valid = 8, 16, 256, 4, 13
    x = _mk((b, sp, d), 0, 1.0).astype(jnp.bfloat16)
    ln_s = (1.0 + _mk((d,), 1))
    ln_b = _mk((d,), 2)
    wqkv = _mk((d, 3 * d), 3).astype(jnp.bfloat16)
    bqkv = _mk((3 * d,), 4).astype(jnp.bfloat16)
    wo = _mk((d, d), 5).astype(jnp.bfloat16)
    bo = _mk((d,), 6).astype(jnp.bfloat16)
    # weight the loss so each output element has a distinct cotangent
    w = _mk((b, sp, d), 7, 1.0)

    def loss(fn):
        def f(x, ln_s, ln_b, wqkv, bqkv, wo, bo):
            out = fn(x, ln_s, ln_b, wqkv, bqkv, wo, bo, heads, n_valid,
                     causal)
            # padded rows (>= n_valid) carry garbage by contract in the
            # kernel path: only read real rows, like the model does
            return jnp.sum(out[:, :n_valid].astype(jnp.float32)
                           * w[:, :n_valid])
        return f

    got = jax.grad(loss(fused_attn_block_train), argnums=(0, 1, 2, 3, 4, 5, 6))(
        x, ln_s, ln_b, wqkv, bqkv, wo, bo)
    want = jax.grad(
        loss(lambda *a: plain_attn_block(
            *a[:7], heads=a[7], n_valid=a[8], causal=a[9])),
        argnums=(0, 1, 2, 3, 4, 5, 6),
    )(x, ln_s, ln_b, wqkv, bqkv, wo, bo)
    names = ("x", "ln_s", "ln_b", "wqkv", "bqkv", "wo", "bo")
    for n, g, wgrad in zip(names, got, want):
        assert np.all(np.isfinite(np.asarray(wgrad, np.float32))), n
        c = _cos(g, wgrad)
        assert c > 0.999, (n, c)


@pytest.mark.parametrize("act", ["gelu", "quick_gelu"])
def test_mlp_block_train_grads_match_reference(interpret_kernels, act):
    from wise_tpu.ops.block import fused_mlp_block_train, plain_mlp_block

    b, sp, d = 8, 16, 256
    x = _mk((b, sp, d), 0, 1.0).astype(jnp.bfloat16)
    ln_s = (1.0 + _mk((d,), 1))
    ln_b = _mk((d,), 2)
    wfc = _mk((d, 4 * d), 3).astype(jnp.bfloat16)
    bfc = _mk((4 * d,), 4).astype(jnp.bfloat16)
    wproj = _mk((4 * d, d), 5).astype(jnp.bfloat16)
    bproj = _mk((d,), 6).astype(jnp.bfloat16)
    w = _mk((b, sp, d), 7, 1.0)

    def loss(fn):
        def f(*ts):
            return jnp.sum(fn(*ts, act).astype(jnp.float32) * w)
        return f

    got = jax.grad(loss(fused_mlp_block_train), argnums=tuple(range(7)))(
        x, ln_s, ln_b, wfc, bfc, wproj, bproj)
    want = jax.grad(
        loss(lambda *ts_and_act: plain_mlp_block(
            *ts_and_act[:7], act=ts_and_act[7])),
        argnums=tuple(range(7)),
    )(x, ln_s, ln_b, wfc, bfc, wproj, bproj)
    for n, g, wgrad in zip(("x", "ln_s", "ln_b", "wfc", "bfc", "wproj",
                            "bproj"), got, want):
        assert np.all(np.isfinite(np.asarray(wgrad, np.float32))), n
        c = _cos(g, wgrad)
        assert c > 0.999, (n, c)


@pytest.mark.parametrize("act", ["gelu", "quick_gelu"])
def test_mlp_split_train_grads_match_reference(interpret_kernels, act):
    """fused_mlp_split_train (two-kernel wide-width variant, round-4
    saved-activation forward via fused_mlp_split_res) must match jax.grad
    of plain_mlp_block — the split is a VMEM-capacity detail, not a
    different function."""
    from wise_tpu.ops.block import fused_mlp_split_train, plain_mlp_block

    b, sp, d = 8, 16, 256
    x = _mk((b, sp, d), 0, 1.0).astype(jnp.bfloat16)
    ln_s = (1.0 + _mk((d,), 1))
    ln_b = _mk((d,), 2)
    wfc = _mk((d, 4 * d), 3).astype(jnp.bfloat16)
    bfc = _mk((4 * d,), 4).astype(jnp.bfloat16)
    wproj = _mk((4 * d, d), 5).astype(jnp.bfloat16)
    bproj = _mk((d,), 6).astype(jnp.bfloat16)
    w = _mk((b, sp, d), 7, 1.0)

    def loss(fn):
        def f(*ts):
            return jnp.sum(fn(*ts, act).astype(jnp.float32) * w)
        return f

    got = jax.grad(loss(fused_mlp_split_train), argnums=tuple(range(7)))(
        x, ln_s, ln_b, wfc, bfc, wproj, bproj)
    want = jax.grad(
        loss(lambda *ts_and_act: plain_mlp_block(
            *ts_and_act[:7], act=ts_and_act[7])),
        argnums=tuple(range(7)),
    )(x, ln_s, ln_b, wfc, bfc, wproj, bproj)
    for n, g, wgrad in zip(("x", "ln_s", "ln_b", "wfc", "bfc", "wproj",
                            "bproj"), got, want):
        assert np.all(np.isfinite(np.asarray(wgrad, np.float32))), n
        c = _cos(g, wgrad)
        assert c > 0.999, (n, c)


def test_postln_attn_block_train_grads_match_reference(monkeypatch):
    from wise_tpu.ops import postln_block as pb

    monkeypatch.setattr(
        pb, "fused_postln_attn_block",
        functools.partial(pb.fused_postln_attn_block, interpret=True),
    )
    b, sp, d, heads = 8, 16, 256, 4
    x = _mk((b, sp, d), 0, 1.0).astype(jnp.bfloat16)
    km = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (b, 1, sp), 2)
        < jnp.arange(5, 5 + b).reshape(b, 1, 1),
        0.0, -jnp.inf).astype(jnp.float32)
    ln_s = 1.0 + _mk((d,), 1)
    ln_b = _mk((d,), 2)
    wqkv = _mk((d, 3 * d), 3).astype(jnp.bfloat16)
    bqkv = _mk((3 * d,), 4).astype(jnp.bfloat16)
    wo = _mk((d, d), 5).astype(jnp.bfloat16)
    bo = _mk((d,), 6).astype(jnp.bfloat16)
    w = _mk((b, sp, d), 7, 1.0)

    def loss(fn):
        def f(x, ln_s, ln_b, wqkv, bqkv, wo, bo):
            out = fn(x, km, ln_s, ln_b, wqkv, bqkv, wo, bo, heads)
            return jnp.sum(out.astype(jnp.float32) * w)
        return f

    got = jax.grad(loss(pb.fused_postln_attn_block_train),
                   argnums=tuple(range(7)))(
        x, ln_s, ln_b, wqkv, bqkv, wo, bo)
    want = jax.grad(
        loss(lambda x, km_, *rest: pb.plain_postln_attn_block(
            x, km_, *rest[:-1], heads=rest[-1])),
        argnums=tuple(range(7)),
    )(x, ln_s, ln_b, wqkv, bqkv, wo, bo)
    for n, g, wgrad in zip(("x", "ln_s", "ln_b", "wqkv", "bqkv", "wo",
                            "bo"), got, want):
        assert np.all(np.isfinite(np.asarray(wgrad, np.float32))), n
        c = _cos(g, wgrad)
        assert c > 0.999, (n, c)


def test_postln_mlp_block_train_grads_match_reference(monkeypatch):
    from wise_tpu.ops import postln_block as pb

    monkeypatch.setattr(
        pb, "fused_postln_mlp_block",
        functools.partial(pb.fused_postln_mlp_block, interpret=True),
    )
    b, sp, d = 8, 16, 256
    x = _mk((b, sp, d), 0, 1.0).astype(jnp.bfloat16)
    ln_s = 1.0 + _mk((d,), 1)
    ln_b = _mk((d,), 2)
    wfc = _mk((d, 4 * d), 3).astype(jnp.bfloat16)
    bfc = _mk((4 * d,), 4).astype(jnp.bfloat16)
    wproj = _mk((4 * d, d), 5).astype(jnp.bfloat16)
    bproj = _mk((d,), 6).astype(jnp.bfloat16)
    w = _mk((b, sp, d), 7, 1.0)

    def loss(fn):
        def f(*ts):
            return jnp.sum(fn(*ts, "gelu").astype(jnp.float32) * w)
        return f

    got = jax.grad(loss(pb.fused_postln_mlp_block_train),
                   argnums=tuple(range(7)))(
        x, ln_s, ln_b, wfc, bfc, wproj, bproj)
    want = jax.grad(
        loss(lambda *a: pb.plain_postln_mlp_block(*a[:7], act=a[7])),
        argnums=tuple(range(7)),
    )(x, ln_s, ln_b, wfc, bfc, wproj, bproj)
    for n, g, wgrad in zip(("x", "ln_s", "ln_b", "wfc", "bfc", "wproj",
                            "bproj"), got, want):
        assert np.all(np.isfinite(np.asarray(wgrad, np.float32))), n
        c = _cos(g, wgrad)
        assert c > 0.999, (n, c)


# ---------------------------------------------------------------------------
# model level
# ---------------------------------------------------------------------------

TINY = dict(
    embed_dim=64, image_size=64, patch_size=16, vision_width=256,
    vision_layers=2, vision_heads=4, context_length=16, vocab_size=128,
    text_width=128, text_heads=2, text_layers=2,
)


def _tiny_cfg(**kw):
    from wise_tpu.models.clip.model import CLIPConfig

    return CLIPConfig(**{**TINY, **kw})


@pytest.fixture
def force_fused_block(monkeypatch, interpret_kernels):
    from wise_tpu.ops import block

    monkeypatch.setattr(
        block, "supports_fused_block",
        lambda b, sp, w, h, dt: jnp.dtype(dt) == jnp.bfloat16
        and w // h == 64 and sp % 8 == 0,
    )
    monkeypatch.setattr(
        block, "supports_fused_block_pooled",
        lambda b, sp, w, h, dt: jnp.dtype(dt) == jnp.bfloat16
        and w // h == 64 and sp % 8 == 0,
    )


def _clip_loss_fn(model, imgs, toks):
    def loss(params):
        img_f, txt_f, scale = model.apply(params, imgs, toks)
        logits = scale * img_f @ txt_f.T
        labels = jnp.arange(logits.shape[0])
        li = -jnp.mean(jax.nn.log_softmax(logits)[labels, labels])
        lt = -jnp.mean(jax.nn.log_softmax(logits.T)[labels, labels])
        return 0.5 * (li + lt)
    return loss


def test_clip_train_step_differentiates_with_fused_block(force_fused_block):
    """The production config class (fused_block=True) must be trainable:
    value_and_grad through the kernel forward, with per-leaf grads
    matching the XLA-path model's (identical parameter tree)."""
    from wise_tpu.models.clip.model import CLIP

    rng = jax.random.PRNGKey(0)
    imgs = jax.random.uniform(rng, (8, 64, 64, 3))
    toks = jax.random.randint(jax.random.PRNGKey(1), (8, 16), 1, 127)
    cfg_fused = _tiny_cfg(dtype=jnp.bfloat16, fused_block=True)
    cfg_xla = _tiny_cfg(dtype=jnp.bfloat16)
    m_fused, m_xla = CLIP(cfg_fused), CLIP(cfg_xla)
    params = m_xla.init(jax.random.PRNGKey(2), imgs, toks)

    lf, gf = jax.value_and_grad(_clip_loss_fn(m_fused, imgs, toks))(params)
    lx, gx = jax.value_and_grad(_clip_loss_fn(m_xla, imgs, toks))(params)
    assert np.isfinite(float(lf)) and np.isfinite(float(lx))
    assert abs(float(lf) - float(lx)) < 5e-2, (float(lf), float(lx))

    flat_f = jax.tree_util.tree_flatten_with_path(gf)[0]
    flat_x = {jax.tree_util.keystr(p): v
              for p, v in jax.tree_util.tree_flatten_with_path(gx)[0]}
    checked = 0
    for path, gleaf in flat_f:
        key = jax.tree_util.keystr(path)
        xleaf = flat_x[key]
        assert np.all(np.isfinite(np.asarray(gleaf, np.float32))), key
        nx = float(np.linalg.norm(np.asarray(xleaf, np.float32)))
        if nx < 1e-7:
            continue  # dead leaves (e.g. padding rows) — nothing to compare
        c = _cos(gleaf, xleaf)
        assert c > 0.98, (key, c)
        checked += 1
    assert checked > 10


@pytest.mark.parametrize("causal", [False, True])
def test_padded_attn_block_train_grads_match_reference(monkeypatch, causal):
    """head_dim-80-class towers (ViT-H — the reference's default
    extract-features backbone) take fused_attn_block_padded_train; its
    backward shares plain_attn_block (the padded-head decomposition is an
    implementation detail of the forward)."""
    from wise_tpu.ops import block
    from wise_tpu.ops.block import (
        fused_attn_block_padded_train,
        plain_attn_block,
    )

    monkeypatch.setattr(
        block, "fused_attn_block_padded",
        functools.partial(block.fused_attn_block_padded, interpret=True,
                          groups=(1, 1)),
    )
    b, sp, d, heads, n_valid = 4, 16, 160, 2, 13  # head_dim 80
    x = _mk((b, sp, d), 20, 1.0).astype(jnp.bfloat16)
    ln_s = 1.0 + _mk((d,), 21)
    ln_b = _mk((d,), 22)
    wqkv = _mk((d, 3 * d), 23).astype(jnp.bfloat16)
    bqkv = _mk((3 * d,), 24).astype(jnp.bfloat16)
    wo = _mk((d, d), 25).astype(jnp.bfloat16)
    bo = _mk((d,), 26).astype(jnp.bfloat16)
    w = _mk((b, sp, d), 27, 1.0)

    def loss(fn):
        def f(x, ln_s, ln_b, wqkv, bqkv, wo, bo):
            out = fn(x, ln_s, ln_b, wqkv, bqkv, wo, bo, heads, n_valid,
                     causal)
            return jnp.sum(out[:, :n_valid].astype(jnp.float32)
                           * w[:, :n_valid])
        return f

    got = jax.grad(loss(fused_attn_block_padded_train),
                   argnums=tuple(range(7)))(
        x, ln_s, ln_b, wqkv, bqkv, wo, bo)
    want = jax.grad(
        loss(lambda *a: plain_attn_block(
            *a[:7], heads=a[7], n_valid=a[8], causal=a[9])),
        argnums=tuple(range(7)),
    )(x, ln_s, ln_b, wqkv, bqkv, wo, bo)
    for n, g, wgrad in zip(("x", "ln_s", "ln_b", "wqkv", "bqkv", "wo",
                            "bo"), got, want):
        assert np.all(np.isfinite(np.asarray(wgrad, np.float32))), n
        c = _cos(g, wgrad)
        assert c > 0.999, (n, c)


@pytest.mark.parametrize("causal", [False, True])
def test_pooled_attn_block_train_grads_match_reference(interpret_kernels,
                                                       causal):
    """fused_attn_block_pooled_train (static pool row — cls towers /
    SigLIP 'last') must match jax.grad of _pooled_block_xla, the plain-ops
    reference its recompute backward differentiates."""
    from wise_tpu.ops.block import (
        _pooled_block_xla,
        fused_attn_block_pooled_train,
    )

    b, sp, d, heads, n_valid, pool_row = 8, 16, 256, 4, 13, 5
    x = _mk((b, sp, d), 30, 1.0).astype(jnp.bfloat16)
    ln_s = 1.0 + _mk((d,), 31)
    ln_b = _mk((d,), 32)
    wqkv = _mk((d, 3 * d), 33).astype(jnp.bfloat16)
    bqkv = _mk((3 * d,), 34).astype(jnp.bfloat16)
    wo = _mk((d, d), 35).astype(jnp.bfloat16)
    bo = _mk((d,), 36).astype(jnp.bfloat16)
    w = _mk((b, d), 37, 1.0)

    def loss(fn):
        def f(x, ln_s, ln_b, wqkv, bqkv, wo, bo):
            out = fn(x, ln_s, ln_b, wqkv, bqkv, wo, bo, heads, n_valid,
                     pool_row, causal)
            return jnp.sum(out.astype(jnp.float32) * w)
        return f

    got = jax.grad(loss(fused_attn_block_pooled_train),
                   argnums=tuple(range(7)))(
        x, ln_s, ln_b, wqkv, bqkv, wo, bo)
    want = jax.grad(loss(_pooled_block_xla), argnums=tuple(range(7)))(
        x, ln_s, ln_b, wqkv, bqkv, wo, bo)
    for n, g, wgrad in zip(("x", "ln_s", "ln_b", "wqkv", "bqkv", "wo",
                            "bo"), got, want):
        assert np.all(np.isfinite(np.asarray(wgrad, np.float32))), n
        c = _cos(g, wgrad)
        assert c > 0.999, (n, c)


@pytest.mark.parametrize("causal", [False, True])
def test_pooled_dyn_attn_block_train_grads_match_reference(
        interpret_kernels, causal):
    """fused_attn_block_pooled_dyn_train (per-example pool rows — argmax/
    EOT CLIP text, CLAP captions) must match jax.grad of
    _pooled_block_xla_dyn; this also exercises _pooled_dyn_train_bwd's
    manual float0 cotangent plumbing for the integer rows argument."""
    from wise_tpu.ops.block import (
        _pooled_block_xla_dyn,
        fused_attn_block_pooled_dyn_train,
    )

    b, sp, d, heads, n_valid = 8, 16, 256, 4, 13
    x = _mk((b, sp, d), 40, 1.0).astype(jnp.bfloat16)
    rows = jnp.array([0, 5, 12, 3, 1, 9, 12, 7], jnp.int32)
    ln_s = 1.0 + _mk((d,), 41)
    ln_b = _mk((d,), 42)
    wqkv = _mk((d, 3 * d), 43).astype(jnp.bfloat16)
    bqkv = _mk((3 * d,), 44).astype(jnp.bfloat16)
    wo = _mk((d, d), 45).astype(jnp.bfloat16)
    bo = _mk((d,), 46).astype(jnp.bfloat16)
    w = _mk((b, d), 47, 1.0)

    def loss(fn):
        def f(x, ln_s, ln_b, wqkv, bqkv, wo, bo):
            out = fn(x, rows, ln_s, ln_b, wqkv, bqkv, wo, bo, heads,
                     n_valid, causal)
            return jnp.sum(out.astype(jnp.float32) * w)
        return f

    got = jax.grad(loss(fused_attn_block_pooled_dyn_train),
                   argnums=tuple(range(7)))(
        x, ln_s, ln_b, wqkv, bqkv, wo, bo)
    want = jax.grad(loss(_pooled_block_xla_dyn), argnums=tuple(range(7)))(
        x, ln_s, ln_b, wqkv, bqkv, wo, bo)
    for n, g, wgrad in zip(("x", "ln_s", "ln_b", "wqkv", "bqkv", "wo",
                            "bo"), got, want):
        assert np.all(np.isfinite(np.asarray(wgrad, np.float32))), n
        c = _cos(g, wgrad)
        assert c > 0.999, (n, c)


def test_clip_train_step_differentiates_with_pool_last(force_fused_block):
    """The FULL production inference config (fused_block=True AND
    pool_last_block=True) must be trainable: the vision tower takes the
    static-cls pooled _train kernel, the text tower the dynamic argmax/EOT
    pooled _train kernel, and per-leaf grads must match the XLA model."""
    from wise_tpu.models.clip.model import CLIP

    rng = jax.random.PRNGKey(0)
    imgs = jax.random.uniform(rng, (8, 64, 64, 3))
    toks = jax.random.randint(jax.random.PRNGKey(1), (8, 16), 1, 127)
    cfg_fused = _tiny_cfg(dtype=jnp.bfloat16, fused_block=True,
                          pool_last_block=True)
    cfg_xla = _tiny_cfg(dtype=jnp.bfloat16)
    m_fused, m_xla = CLIP(cfg_fused), CLIP(cfg_xla)
    params = m_xla.init(jax.random.PRNGKey(2), imgs, toks)

    lf, gf = jax.value_and_grad(_clip_loss_fn(m_fused, imgs, toks))(params)
    lx, gx = jax.value_and_grad(_clip_loss_fn(m_xla, imgs, toks))(params)
    assert np.isfinite(float(lf)) and np.isfinite(float(lx))
    assert abs(float(lf) - float(lx)) < 5e-2, (float(lf), float(lx))

    flat_f = jax.tree_util.tree_flatten_with_path(gf)[0]
    flat_x = {jax.tree_util.keystr(p): v
              for p, v in jax.tree_util.tree_flatten_with_path(gx)[0]}
    checked = 0
    for path, gleaf in flat_f:
        key = jax.tree_util.keystr(path)
        xleaf = flat_x[key]
        assert np.all(np.isfinite(np.asarray(gleaf, np.float32))), key
        nx = float(np.linalg.norm(np.asarray(xleaf, np.float32)))
        if nx < 1e-7:
            continue  # dead leaves (e.g. padding rows) — nothing to compare
        c = _cos(gleaf, xleaf)
        assert c > 0.98, (key, c)
        checked += 1
    assert checked > 10


def test_attn_block_train_composes_with_remat(interpret_kernels):
    """jax.checkpoint around the saved-activation _train wrapper (the
    --remat fine-tune path for ViT-H-class models, where params+Adam
    alone are ~10 GB of a 16 GB chip): remat recomputes the kernel
    forward in the backward, then runs the custom cut-point VJP on the
    recomputed residuals — grads must still match the plain reference."""
    from wise_tpu.ops.block import fused_attn_block_train, plain_attn_block

    b, sp, d, heads, n_valid = 8, 16, 256, 4, 13
    x = _mk((b, sp, d), 0, 1.0).astype(jnp.bfloat16)
    ln_s = 1.0 + _mk((d,), 1)
    ln_b = _mk((d,), 2)
    wqkv = _mk((d, 3 * d), 3).astype(jnp.bfloat16)
    bqkv = _mk((3 * d,), 4).astype(jnp.bfloat16)
    wo = _mk((d, d), 5).astype(jnp.bfloat16)
    bo = _mk((d,), 6).astype(jnp.bfloat16)
    w = _mk((b, sp, d), 7, 1.0)

    def loss(fn):
        def f(x, ln_s, ln_b, wqkv, bqkv, wo, bo):
            out = fn(x, ln_s, ln_b, wqkv, bqkv, wo, bo)
            return jnp.sum(out[:, :n_valid].astype(jnp.float32)
                           * w[:, :n_valid])
        return f

    rematted = jax.checkpoint(
        lambda *ts: fused_attn_block_train(*ts, heads, n_valid, False)
    )
    got = jax.grad(loss(rematted), argnums=tuple(range(7)))(
        x, ln_s, ln_b, wqkv, bqkv, wo, bo)
    want = jax.grad(
        loss(lambda *ts: plain_attn_block(
            *ts, heads=heads, n_valid=n_valid, causal=False)),
        argnums=tuple(range(7)),
    )(x, ln_s, ln_b, wqkv, bqkv, wo, bo)
    for n, g, wgrad in zip(("x", "ln_s", "ln_b", "wqkv", "bqkv", "wo",
                            "bo"), got, want):
        c = _cos(g, wgrad)
        assert c > 0.999, (n, c)


def test_attn_train_falls_back_to_recompute_when_res_rejected(
        interpret_kernels, monkeypatch):
    """When the res-aware VMEM estimate rejects every group (the extra
    qkv residual output doesn't fit), the _train forward must run the
    plain kernel and the backward the recompute pullback — same grads,
    no crash (the round-4 review found the inference estimate could
    admit a shape whose training forward then failed Mosaic's check)."""
    from wise_tpu.ops import block
    from wise_tpu.ops.block import fused_attn_block_train, plain_attn_block

    real_attn_group = block._attn_group
    monkeypatch.setattr(
        block, "_attn_group",
        lambda b, sp, d, res=False: (
            None if res else real_attn_group(b, sp, d)),
    )
    b, sp, d, heads, n_valid = 8, 16, 256, 4, 13
    x = _mk((b, sp, d), 0, 1.0).astype(jnp.bfloat16)
    ln_s = 1.0 + _mk((d,), 1)
    ln_b = _mk((d,), 2)
    wqkv = _mk((d, 3 * d), 3).astype(jnp.bfloat16)
    bqkv = _mk((3 * d,), 4).astype(jnp.bfloat16)
    wo = _mk((d, d), 5).astype(jnp.bfloat16)
    bo = _mk((d,), 6).astype(jnp.bfloat16)
    w = _mk((b, sp, d), 7, 1.0)

    def loss(fn):
        def f(*ts):
            out = fn(*ts, heads, n_valid, False)
            return jnp.sum(out[:, :n_valid].astype(jnp.float32)
                           * w[:, :n_valid])
        return f

    got = jax.grad(loss(fused_attn_block_train), argnums=tuple(range(7)))(
        x, ln_s, ln_b, wqkv, bqkv, wo, bo)
    want = jax.grad(
        loss(lambda *ts_s: plain_attn_block(
            *ts_s[:7], heads=ts_s[7], n_valid=ts_s[8], causal=ts_s[9])),
        argnums=tuple(range(7)),
    )(x, ln_s, ln_b, wqkv, bqkv, wo, bo)
    for n, g, wgrad in zip(("x", "ln_s", "ln_b", "wqkv", "bqkv", "wo",
                            "bo"), got, want):
        c = _cos(g, wgrad)
        assert c > 0.999, (n, c)


def test_calibrated_groups_res_gating():
    """Calibrated group entries are trusted on the saved-activation
    (res=True) path only for shapes whose training forward actually ran
    on hardware (_TRAIN_RES_VALIDATED); any other calibrated shape must
    re-pass the res-aware analytic estimate or fall through (round-4
    advisor finding: the extra residual output could otherwise hit a hard
    Mosaic scoped-vmem failure). (576, 1024) — SigLIP-384 — is the live
    case: calibrated inference groups stay, res=True degrades to the
    recompute backward."""
    from wise_tpu.ops.block import (
        _TRAIN_RES_VALIDATED, _attn_group, _mlp_group, _mlp_split_group)

    # inference path unchanged: calibrated winners
    assert _attn_group(512, 576, 1024) == 2
    assert _mlp_split_group(512, 576, 1024) == 1
    # unvalidated calibrated shape: res path rejected end-to-end (the
    # qkv residual alone is ~14 MB/group at g=2)
    assert _attn_group(512, 576, 1024, res=True) is None
    assert _mlp_split_group(512, 576, 1024, res=True) is None
    # hardware-validated shapes keep their calibrated groups for training
    assert (56, 768) in _TRAIN_RES_VALIDATED
    assert _attn_group(512, 56, 768, res=True) == 2
    assert _mlp_group(512, 56, 768, res=True) == 1
    assert _attn_group(512, 264, 1024, res=True) == 2
    assert _mlp_split_group(512, 264, 1024, res=True) == 2


def test_attn_saved_bwd_f32_residual_bias_bound(interpret_kernels):
    """The saved-activation backward differentiates stage B at the
    WEIGHT-dtype residual; with bf16 weights that is a systematic
    rounding-class gradient bias vs the executed forward (documented at
    fused_attn_block_res). With f32 weights the residual is exact, so
    the same backward must match the plain vjp far TIGHTER than the bf16
    0.999 bound — pinning that the bias is bf16-rounding-class, not a
    math error in the cut-point rule."""
    from wise_tpu.ops.block import fused_attn_block_train, plain_attn_block

    b, sp, d, heads, n_valid = 8, 16, 256, 4, 13
    x = _mk((b, sp, d), 0, 1.0)
    ln_s = 1.0 + _mk((d,), 1)
    ln_b = _mk((d,), 2)
    wqkv = _mk((d, 3 * d), 3)
    bqkv = _mk((3 * d,), 4)
    wo = _mk((d, d), 5)
    bo = _mk((d,), 6)
    w = _mk((b, sp, d), 7, 1.0)

    def loss(fn):
        def f(*ts):
            out = fn(*ts, heads, n_valid, False)
            return jnp.sum(out[:, :n_valid].astype(jnp.float32)
                           * w[:, :n_valid])
        return f

    got = jax.grad(loss(fused_attn_block_train), argnums=tuple(range(7)))(
        x, ln_s, ln_b, wqkv, bqkv, wo, bo)
    want = jax.grad(
        loss(lambda *ts: plain_attn_block(
            *ts[:7], heads=ts[7], n_valid=ts[8], causal=ts[9])),
        argnums=tuple(range(7)),
    )(x, ln_s, ln_b, wqkv, bqkv, wo, bo)
    for n, g, wgrad in zip(("x", "ln_s", "ln_b", "wqkv", "bqkv", "wo",
                            "bo"), got, want):
        a64 = np.asarray(g, np.float64).ravel()
        b64 = np.asarray(wgrad, np.float64).ravel()
        c = float(a64 @ b64 / (np.linalg.norm(a64) * np.linalg.norm(b64)
                               + 1e-30))
        # 1e-7 (f32 accumulation-order class) vs the bf16 path's 0.999
        assert c > 1.0 - 1e-7, (n, c)
