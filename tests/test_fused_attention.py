"""Fused short-sequence attention (ops/attention.py): interpret-mode kernel
vs the XLA path, key-pad masking, and the padded vision tower's fallback
equivalence (on CPU supports_fused() is False, so the tower exercises the
pad + key-mask + slice logic through the XLA path)."""

import dataclasses

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from wise_tpu.ops.attention import (
    fused_short_attention,
    supports_fused,
    xla_attention,
)


def test_kernel_matches_xla_interpret(rng):
    b, sp, d, heads = 8, 16, 128, 2
    n_valid = 13
    q, k, v = (
        jnp.asarray(rng.standard_normal((b, sp, d)), jnp.bfloat16)
        for _ in range(3)
    )
    out = np.asarray(
        fused_short_attention(
            q, k, v, heads=heads, n_valid=n_valid, interpret=True
        ),
        np.float32,
    )
    col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, sp), 3)
    mask = jnp.where(col < n_valid, 0.0, -jnp.inf)
    ref = np.asarray(
        xla_attention(q, k, v, heads=heads, mask=mask), np.float32
    )
    # valid query rows match to bf16 tolerance; padded rows are undefined
    np.testing.assert_allclose(
        out[:, :n_valid], ref[:, :n_valid], atol=2e-2
    )


def test_kernel_head_dim_80_interpret(rng):
    b, sp, d, heads = 8, 16, 160, 2   # head_dim 80 (the ViT-H class)
    q, k, v = (
        jnp.asarray(rng.standard_normal((b, sp, d)), jnp.bfloat16)
        for _ in range(3)
    )
    out = np.asarray(
        fused_short_attention(
            q, k, v, heads=heads, n_valid=sp, interpret=True
        ),
        np.float32,
    )
    ref = np.asarray(xla_attention(q, k, v, heads=heads), np.float32)
    np.testing.assert_allclose(out, ref, atol=2e-2)


def test_kernel_causal_interpret(rng):
    b, sp, d, heads = 8, 16, 128, 2
    n_valid = 13
    q, k, v = (
        jnp.asarray(rng.standard_normal((b, sp, d)), jnp.bfloat16)
        for _ in range(3)
    )
    out = np.asarray(
        fused_short_attention(
            q, k, v, heads=heads, n_valid=n_valid, causal=True,
            interpret=True,
        ),
        np.float32,
    )
    col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, sp, sp), 3)
    row = jax.lax.broadcasted_iota(jnp.int32, (1, 1, sp, sp), 2)
    mask = jnp.where((col < n_valid) & (col <= row), 0.0, -jnp.inf)
    ref = np.asarray(
        xla_attention(q, k, v, heads=heads, mask=mask), np.float32
    )
    np.testing.assert_allclose(
        out[:, :n_valid], ref[:, :n_valid], atol=2e-2
    )


def test_padded_map_pool_tower_matches_unfused(rng):
    """SigLIP-style MAP-pooled vision: padded rows are sliced off before
    the attention-pool head, so fused_attention must not change outputs."""
    from wise_tpu.models.clip.model import CLIP, CLIPConfig

    base = CLIPConfig(
        embed_dim=32, image_size=48, patch_size=16, vision_width=128,
        vision_layers=2, vision_heads=2, context_length=16, vocab_size=64,
        text_width=32, text_heads=2, text_layers=1, dtype=jnp.bfloat16,
        vision_pool="map", text_causal=False, text_pool="last",
        act="gelu_tanh", text_proj_bias=True,
    )  # 9 tokens (no cls) -> pads to 16
    fused_cfg = dataclasses.replace(base, fused_attention=True)
    m0, m1 = CLIP(base), CLIP(fused_cfg)
    params = m0.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 48, 48, 3), jnp.float32),
        jnp.zeros((1, 16), jnp.int32),
    )
    imgs = jnp.asarray(rng.standard_normal((4, 48, 48, 3)), jnp.float32)
    e0 = np.asarray(m0.apply(params, imgs, method=CLIP.encode_image))
    e1 = np.asarray(m1.apply(params, imgs, method=CLIP.encode_image))
    # bf16 tower: the 9 -> 16 shape change reorders bf16 reductions, so
    # bit-equality is not expected; pad-token LEAKAGE into the MAP head
    # would move outputs by ~1e-1 with 7 garbage rows of 16 and fail this
    cos = np.sum(e0 * e1, axis=1)
    assert (cos > 0.999).all(), cos
    np.testing.assert_allclose(e0, e1, atol=2e-2)


def test_padded_text_tower_matches_unfused(rng):
    from wise_tpu.models.clip.model import CLIP, CLIPConfig

    base = CLIPConfig(
        embed_dim=32, image_size=32, patch_size=16, vision_width=128,
        vision_layers=1, vision_heads=2, context_length=13, vocab_size=64,
        text_width=128, text_heads=2, text_layers=2, dtype=jnp.bfloat16,
    )  # 13 tokens -> pads to 16 under fused_attention
    fused_cfg = dataclasses.replace(base, fused_attention=True)
    m0, m1 = CLIP(base), CLIP(fused_cfg)
    params = m0.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 32, 32, 3), jnp.float32),
        jnp.zeros((1, 13), jnp.int32),
    )
    toks = jnp.asarray(rng.integers(1, 64, (4, 13)), jnp.int32)
    e0 = np.asarray(m0.apply(params, toks, method=CLIP.encode_text))
    e1 = np.asarray(m1.apply(params, toks, method=CLIP.encode_text))
    np.testing.assert_allclose(e0, e1, atol=1e-5)


def test_supports_fused_gate():
    from wise_tpu.ops.attention import _pick_group

    bf16 = jnp.bfloat16
    assert not supports_fused(8, 50, 768, 12, bf16)      # seq % 8
    assert not supports_fused(8, 56, 768, 12, jnp.float32)
    assert not supports_fused(8, 56, 1408, 16, bf16)     # head_dim 88
    # head_dim 80 regressed end-to-end (BENCHMARKS.md) — gated off
    assert not supports_fused(128, 264, 1280, 16, bf16)
    # VMEM-driven group selection: short seq -> 8, ViT-L shapes -> 2,
    # huge working set -> infeasible
    assert _pick_group(512, 56, 768) == 8
    assert _pick_group(256, 264, 1024) == 2
    assert _pick_group(3, 264, 1024) == 1   # odd batches run group 1
    assert _pick_group(1, 2048, 1024) is None
    assert not supports_fused(1, 2048, 1024, 16, bf16)
    # shape-valid cases only pass on an actual TPU backend
    on_tpu = jax.default_backend() == "tpu"
    assert supports_fused(8, 56, 768, 12, bf16) == on_tpu
    assert supports_fused(256, 264, 1024, 16, bf16) == on_tpu
    assert supports_fused(1, 56, 768, 12, bf16) == on_tpu  # single query


def test_padded_tower_matches_unfused(rng):
    from wise_tpu.models.clip.model import CLIP, CLIPConfig

    base = CLIPConfig(
        embed_dim=32, image_size=32, patch_size=16, vision_width=128,
        vision_layers=2, vision_heads=2, context_length=16, vocab_size=64,
        text_width=32, text_heads=2, text_layers=1, dtype=jnp.bfloat16,
    )  # 5 tokens -> pads to 8 under fused_attention
    fused_cfg = dataclasses.replace(base, fused_attention=True)
    m0, m1 = CLIP(base), CLIP(fused_cfg)
    params = m0.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 32, 32, 3), jnp.float32),
        jnp.zeros((1, 16), jnp.int32),
    )
    imgs = jnp.asarray(rng.standard_normal((4, 32, 32, 3)), jnp.float32)
    e0 = np.asarray(m0.apply(params, imgs, method=CLIP.encode_image))
    e1 = np.asarray(m1.apply(params, imgs, method=CLIP.encode_image))
    # padding + key-mask must not change the embeddings
    np.testing.assert_allclose(e0, e1, atol=1e-5)


class TestTrainableVJP:
    """fused_attention_trainable: Pallas forward + recompute backward."""

    def _setup(self, monkeypatch, causal):
        import functools

        import jax
        import jax.numpy as jnp

        from wise_tpu.ops import attention as A

        monkeypatch.setattr(
            A, "fused_short_attention",
            functools.partial(A.fused_short_attention, interpret=True),
        )
        b, sp, d, heads, n_valid = 4, 16, 128, 2, 13
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        q, k, v = (
            (0.5 * jax.random.normal(kk, (b, sp, d))).astype(jnp.bfloat16)
            for kk in ks
        )
        return A, q, k, v, heads, n_valid

    @pytest.mark.parametrize("causal", [False, True])
    def test_grads_match_xla_path(self, monkeypatch, causal):
        import jax
        import jax.numpy as jnp
        import numpy as np

        A, q, k, v, heads, n_valid = self._setup(monkeypatch, causal)
        mask = A._pad_causal_mask(q.shape[1], n_valid, causal)

        def loss_fused(q, k, v):
            out = A.fused_attention_trainable(q, k, v, heads, n_valid,
                                              causal)
            return jnp.sum(out[:, :n_valid].astype(jnp.float32) ** 2)

        def loss_xla(q, k, v):
            out = A.xla_attention(q, k, v, heads=heads, mask=mask,
                                  softmax_f32=True, out_dtype=q.dtype)
            return jnp.sum(out[:, :n_valid].astype(jnp.float32) ** 2)

        gf = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
        gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
        for a, b_ in zip(gf, gx):
            # backward IS the XLA vjp (recompute); only the primal's
            # cotangent differs by fused-vs-XLA rounding
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b_, np.float32),
                rtol=0.08, atol=0.02,
            )

    def test_padded_key_columns_get_zero_grad(self, monkeypatch):
        import jax
        import jax.numpy as jnp
        import numpy as np

        A, q, k, v, heads, n_valid = self._setup(monkeypatch, False)

        def loss(k, v):
            out = A.fused_attention_trainable(q, k, v, heads, n_valid,
                                              False)
            return jnp.sum(out[:, :n_valid].astype(jnp.float32) ** 2)

        gk, gv = jax.grad(loss, argnums=(0, 1))(k, v)
        assert float(jnp.abs(gk[:, n_valid:]).max()) == 0.0
        assert float(jnp.abs(gv[:, n_valid:]).max()) == 0.0


class TestSPMDRule:
    """custom_partitioning: under GSPMD the kernel runs per batch shard —
    no all-gathers of q/k/v appear in the compiled module."""

    def test_dp_sharded_matches_xla_and_no_gather(self, monkeypatch):
        import functools

        import jax
        import jax.numpy as jnp
        import numpy as np
        from jax.sharding import NamedSharding, PartitionSpec as P

        from wise_tpu.ops import attention as A
        from wise_tpu.parallel.mesh import get_mesh

        monkeypatch.setattr(
            A, "fused_short_attention",
            functools.partial(A.fused_short_attention, interpret=True),
        )
        mesh = get_mesh(dp=8)
        b, sp, d, heads, n_valid = 16, 16, 128, 2, 13
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        q, k, v = (
            (0.5 * jax.random.normal(kk, (b, sp, d))).astype(jnp.bfloat16)
            for kk in ks
        )
        sh = NamedSharding(mesh, P("dp", None, None))
        qs, ks_, vs = (jax.device_put(t, sh) for t in (q, k, v))

        f = jax.jit(
            lambda q, k, v: A.fused_attention_trainable(
                q, k, v, heads, n_valid, False
            )
        )
        lowered = f.lower(qs, ks_, vs).compile()
        hlo = lowered.as_text()
        assert "all-gather" not in hlo and "all-reduce" not in hlo, (
            "GSPMD inserted collectives around the kernel"
        )
        got = np.asarray(f(qs, ks_, vs), np.float32)

        mask = A._pad_causal_mask(sp, n_valid, False)
        want = np.asarray(
            A.xla_attention(q, k, v, heads=heads, mask=mask,
                            softmax_f32=True, out_dtype=q.dtype),
            np.float32,
        )
        num = (got[:, :n_valid] * want[:, :n_valid]).sum(-1)
        den = (
            np.linalg.norm(got[:, :n_valid], axis=-1)
            * np.linalg.norm(want[:, :n_valid], axis=-1) + 1e-30
        )
        assert (num / den).min() > 0.999

    def test_grad_under_sharding(self, monkeypatch):
        import functools

        import jax
        import jax.numpy as jnp
        import numpy as np
        from jax.sharding import NamedSharding, PartitionSpec as P

        from wise_tpu.ops import attention as A
        from wise_tpu.parallel.mesh import get_mesh

        monkeypatch.setattr(
            A, "fused_short_attention",
            functools.partial(A.fused_short_attention, interpret=True),
        )
        mesh = get_mesh(dp=8)
        b, sp, d, heads, n_valid = 16, 16, 128, 2, 13
        ks = jax.random.split(jax.random.PRNGKey(1), 3)
        q, k, v = (
            (0.5 * jax.random.normal(kk, (b, sp, d))).astype(jnp.bfloat16)
            for kk in ks
        )
        sh = NamedSharding(mesh, P("dp", None, None))
        qs, ks_, vs = (jax.device_put(t, sh) for t in (q, k, v))

        def loss(q, k, v):
            out = A.fused_attention_trainable(q, k, v, heads, n_valid,
                                              False)
            return jnp.sum(out[:, :n_valid].astype(jnp.float32) ** 2)

        gf = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(qs, ks_, vs)
        mask = A._pad_causal_mask(sp, n_valid, False)

        def loss_x(q, k, v):
            out = A.xla_attention(q, k, v, heads=heads, mask=mask,
                                  softmax_f32=True, out_dtype=q.dtype)
            return jnp.sum(out[:, :n_valid].astype(jnp.float32) ** 2)

        gx = jax.grad(loss_x, argnums=(0, 1, 2))(q, k, v)
        for a, b_ in zip(gf, gx):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b_, np.float32),
                rtol=0.08, atol=0.02,
            )
