"""Model-level fused-block path (CLIPConfig.fused_block) on CPU.

supports_fused_block gates on a real TPU backend, so these tests force the
gate open and run the kernels in interpret mode, checking (a) the fused
branch declares EXACTLY the same parameter tree as the XLA branch (one
checkpoint layout for both), and (b) the tower embeddings agree."""

import functools
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


TINY = dict(
    embed_dim=64, image_size=64, patch_size=16, vision_width=256,
    vision_layers=2, vision_heads=4, context_length=16, vocab_size=128,
    text_width=128, text_heads=2, text_layers=2,
)


def _tiny_cfg(**kw):
    from wise_tpu.models.clip.model import CLIPConfig

    return CLIPConfig(**{**TINY, **kw})


@pytest.fixture
def force_fused_block(monkeypatch):
    """Open the TPU gate and run the kernels in interpret mode."""
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
    monkeypatch.setattr(
        block, "fused_attn_block",
        functools.partial(block.fused_attn_block, interpret=True),
    )
    monkeypatch.setattr(
        block, "fused_mlp_block",
        functools.partial(block.fused_mlp_block, interpret=True),
    )


def _paths(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_paths(v, prefix + (k,)))
        else:
            out["/".join(prefix + (k,))] = (v.shape, v.dtype)
    return out


def test_param_tree_identical(force_fused_block):
    """init under the fused branch == init under the XLA branch."""
    from wise_tpu.models.clip.model import CLIP

    imgs = jnp.zeros((8, 64, 64, 3))
    toks = jnp.zeros((8, 16), jnp.int32)
    p_fused = CLIP(_tiny_cfg(dtype=jnp.bfloat16, fused_block=True)).init(
        jax.random.PRNGKey(0), imgs, toks
    )
    p_xla = CLIP(_tiny_cfg(dtype=jnp.bfloat16)).init(
        jax.random.PRNGKey(0), imgs, toks
    )
    a, b = _paths(p_fused["params"]), _paths(p_xla["params"])
    assert a == b
    # identical RNG draws for identical paths
    flat_a = jax.tree_util.tree_leaves(p_fused["params"])
    flat_b = jax.tree_util.tree_leaves(p_xla["params"])
    for la, lb in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


@pytest.mark.parametrize("quick_gelu", [False, True])
def test_image_embeddings_match(force_fused_block, quick_gelu):
    from wise_tpu.models.clip.model import CLIP

    cfg_x = _tiny_cfg(dtype=jnp.bfloat16, quick_gelu=quick_gelu)
    cfg_f = _tiny_cfg(dtype=jnp.bfloat16, quick_gelu=quick_gelu,
                      fused_block=True)
    imgs = jax.random.normal(jax.random.PRNGKey(1), (8, 64, 64, 3))
    toks = jnp.zeros((1, 16), jnp.int32)
    params = CLIP(cfg_x).init(jax.random.PRNGKey(0), imgs[:1], toks)
    want = CLIP(cfg_x).apply(params, imgs, method="encode_image")
    got = CLIP(cfg_f).apply(params, imgs, method="encode_image")
    cos = (np.asarray(got) * np.asarray(want)).sum(-1)
    assert cos.min() > 0.999, cos.min()


def test_text_embeddings_match_causal(force_fused_block):
    from wise_tpu.models.clip.model import CLIP

    cfg_x = _tiny_cfg(dtype=jnp.bfloat16)
    cfg_f = _tiny_cfg(dtype=jnp.bfloat16, fused_block=True)
    imgs = jnp.zeros((1, 64, 64, 3))
    toks = jax.random.randint(jax.random.PRNGKey(2), (8, 16), 1, 127)
    # EOT = highest id at a fixed position
    toks = toks.at[:, -2].set(127)
    params = CLIP(cfg_x).init(jax.random.PRNGKey(0), imgs, toks[:1])
    want = CLIP(cfg_x).apply(params, toks, method="encode_text")
    got = CLIP(cfg_f).apply(params, toks, method="encode_text")
    cos = (np.asarray(got) * np.asarray(want)).sum(-1)
    assert cos.min() > 0.999, cos.min()


@pytest.mark.parametrize("dtype_name", ["float32", "bfloat16"])
def test_pool_last_block_matches_full(dtype_name):
    """pool_last_block=True (plain-ops pooled path on CPU) must reproduce
    the full tower's cls embedding — identical math, ~1 layer saved."""
    from wise_tpu.models.clip.model import CLIP

    dt = jnp.float32 if dtype_name == "float32" else jnp.bfloat16
    cfg_full = _tiny_cfg(dtype=dt)
    cfg_pool = _tiny_cfg(dtype=dt, pool_last_block=True)
    imgs = jax.random.normal(jax.random.PRNGKey(9), (8, 64, 64, 3))
    toks = jnp.zeros((1, 16), jnp.int32)
    params = CLIP(cfg_full).init(jax.random.PRNGKey(0), imgs[:1], toks)
    want = CLIP(cfg_full).apply(params, imgs, method="encode_image")
    got = CLIP(cfg_pool).apply(params, imgs, method="encode_image")
    if dtype_name == "float32":
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5
        )
    else:
        cos = (np.asarray(got) * np.asarray(want)).sum(-1)
        assert cos.min() > 0.999, cos.min()
    # init under the pooled path declares the same parameter tree
    p2 = CLIP(cfg_pool).init(jax.random.PRNGKey(0), imgs[:1], toks)
    assert _paths(p2["params"]) == _paths(params["params"])


def test_pool_last_block_fused_kernel(force_fused_block, monkeypatch):
    """With the fused-block gate open, the pooled last layer runs the
    fused_attn_block_pooled kernel (spied) and matches the full XLA tower."""
    import functools as ft

    from wise_tpu.models.clip.model import CLIP
    from wise_tpu.ops import block

    monkeypatch.setattr(
        block, "fused_attn_block_pooled",
        ft.partial(block.fused_attn_block_pooled, interpret=True),
    )
    calls = []
    orig = block.fused_attn_block_pooled_spmd

    def spy(*a, **kw):
        calls.append(1)
        return orig(*a, **kw)

    monkeypatch.setattr(block, "fused_attn_block_pooled_spmd", spy)
    cfg_x = _tiny_cfg(dtype=jnp.bfloat16)
    cfg_f = _tiny_cfg(dtype=jnp.bfloat16, fused_block=True,
                      pool_last_block=True)
    imgs = jax.random.normal(jax.random.PRNGKey(11), (8, 64, 64, 3))
    toks = jnp.zeros((1, 16), jnp.int32)
    params = CLIP(cfg_x).init(jax.random.PRNGKey(0), imgs[:1], toks)
    want = CLIP(cfg_x).apply(params, imgs, method="encode_image")
    got = CLIP(cfg_f).apply(params, imgs, method="encode_image")
    assert calls, "fused_attn_block_pooled_spmd was not selected"
    cos = (np.asarray(got) * np.asarray(want)).sum(-1)
    assert cos.min() > 0.999, cos.min()


@pytest.mark.parametrize("dtype_name", ["float32", "bfloat16"])
def test_pool_last_block_argmax_text(dtype_name):
    """CLIP argmax/EOT text pooling: the DYNAMIC pooled-row last layer
    (plain-ops path on CPU) must reproduce the full tower per example,
    including varying EOT positions within one batch."""
    from wise_tpu.models.clip.model import CLIP

    dt = jnp.float32 if dtype_name == "float32" else jnp.bfloat16
    cfg_full = _tiny_cfg(dtype=dt)
    cfg_pool = _tiny_cfg(dtype=dt, pool_last_block=True)
    imgs = jnp.zeros((1, 64, 64, 3))
    toks = jax.random.randint(jax.random.PRNGKey(21), (8, 16), 1, 100)
    # EOT (highest id) at a DIFFERENT position per example
    eot_pos = np.array([3, 15, 7, 1, 11, 15, 2, 9])
    toks = toks.at[jnp.arange(8), jnp.asarray(eot_pos)].set(127)
    params = CLIP(cfg_full).init(jax.random.PRNGKey(0), imgs, toks[:1])
    want = CLIP(cfg_full).apply(params, toks, method="encode_text")
    got = CLIP(cfg_pool).apply(params, toks, method="encode_text")
    if dtype_name == "float32":
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5
        )
    else:
        cos = (np.asarray(got) * np.asarray(want)).sum(-1)
        assert cos.min() > 0.999, cos.min()
    p2 = CLIP(cfg_pool).init(jax.random.PRNGKey(0), imgs, toks[:1])
    assert _paths(p2["params"]) == _paths(params["params"])


def test_pool_last_block_argmax_text_fused_kernel(force_fused_block,
                                                  monkeypatch):
    """With the fused-block gate open, the argmax-pooled text tower's last
    layer runs the DYNAMIC pooled kernel (spied) and matches the full XLA
    tower."""
    import functools as ft

    from wise_tpu.models.clip.model import CLIP
    from wise_tpu.ops import block

    monkeypatch.setattr(
        block, "fused_attn_block_pooled_dyn",
        ft.partial(block.fused_attn_block_pooled_dyn, interpret=True,
                   group=8),
    )
    calls = []
    orig = block.fused_attn_block_pooled_dyn_spmd

    def spy(*a, **kw):
        calls.append(1)
        return orig(*a, **kw)

    monkeypatch.setattr(block, "fused_attn_block_pooled_dyn_spmd", spy)
    cfg_x = _tiny_cfg(dtype=jnp.bfloat16)
    cfg_f = _tiny_cfg(dtype=jnp.bfloat16, fused_block=True,
                      pool_last_block=True)
    imgs = jnp.zeros((1, 64, 64, 3))
    toks = jax.random.randint(jax.random.PRNGKey(23), (8, 16), 1, 100)
    eot_pos = np.array([3, 15, 7, 1, 11, 15, 2, 9])
    toks = toks.at[jnp.arange(8), jnp.asarray(eot_pos)].set(127)
    params = CLIP(cfg_x).init(jax.random.PRNGKey(0), imgs, toks[:1])
    want = CLIP(cfg_x).apply(params, toks, method="encode_text")
    got = CLIP(cfg_f).apply(params, toks, method="encode_text")
    assert calls, "fused_attn_block_pooled_dyn_spmd was not selected"
    cos = (np.asarray(got) * np.asarray(want)).sum(-1)
    assert cos.min() > 0.999, cos.min()


def test_pool_last_block_siglip_text():
    """SigLIP 'last'-pooled text tower: the pooled-row last layer must
    reproduce the full tower (static row n_tok-1, non-causal)."""
    from wise_tpu.models.clip.model import CLIP

    kw = dict(
        vision_pool="map", text_causal=False, text_pool="last",
        act="gelu_tanh", text_proj_bias=True,
    )
    cfg_full = _tiny_cfg(**kw)
    cfg_pool = _tiny_cfg(pool_last_block=True, **kw)
    imgs = jnp.zeros((1, 64, 64, 3))
    toks = jax.random.randint(jax.random.PRNGKey(13), (8, 16), 1, 127)
    params = CLIP(cfg_full).init(jax.random.PRNGKey(0), imgs, toks[:1])
    want = CLIP(cfg_full).apply(params, toks, method="encode_text")
    got = CLIP(cfg_pool).apply(params, toks, method="encode_text")
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5
    )


def test_patch_embed_matmul_matches_conv():
    """patch_embed_matmul: identical params, near-identical embeddings
    (same math, different XLA op — f32 tolerances)."""
    from wise_tpu.models.clip.model import CLIP

    cfg_conv = _tiny_cfg()
    cfg_mm = _tiny_cfg(patch_embed_matmul=True)
    imgs = jax.random.normal(jax.random.PRNGKey(3), (4, 64, 64, 3))
    toks = jnp.zeros((1, 16), jnp.int32)
    params = CLIP(cfg_conv).init(jax.random.PRNGKey(0), imgs[:1], toks)
    want = CLIP(cfg_conv).apply(params, imgs, method="encode_image")
    got = CLIP(cfg_mm).apply(params, imgs, method="encode_image")
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5
    )
    # init under the matmul path declares the same tree
    p2 = CLIP(cfg_mm).init(jax.random.PRNGKey(0), imgs[:1], toks)
    assert _paths(p2["params"]) == _paths(params["params"])


def test_map_pooled_vision_fused_block(force_fused_block):
    """SigLIP-style MAP-pooled tower: blocks run fused, the attention-pool
    head stays XLA, embeddings agree."""
    from wise_tpu.models.clip.model import CLIP

    kw = dict(
        vision_pool="map", text_causal=False, text_pool="last",
        act="gelu_tanh", text_proj_bias=True, dtype=jnp.bfloat16,
    )
    cfg_x = _tiny_cfg(**kw)
    cfg_f = _tiny_cfg(fused_block=True, **kw)
    imgs = jax.random.normal(jax.random.PRNGKey(5), (8, 64, 64, 3))
    toks = jnp.zeros((1, 16), jnp.int32)
    params = CLIP(cfg_x).init(jax.random.PRNGKey(0), imgs[:1], toks)
    want = CLIP(cfg_x).apply(params, imgs, method="encode_image")
    got = CLIP(cfg_f).apply(params, imgs, method="encode_image")
    cos = (np.asarray(got) * np.asarray(want)).sum(-1)
    assert cos.min() > 0.999, cos.min()


def test_split_mlp_fallback_selected(force_fused_block, monkeypatch):
    """When the single-kernel MLP's weights don't fit VMEM
    (_mlp_group -> None), the model selects the two-kernel split pair
    (fused_mlp_split) instead of falling back to XLA, and embeddings
    still agree with the XLA path."""
    import functools as ft

    from wise_tpu.models.clip.model import CLIP
    from wise_tpu.ops import block

    monkeypatch.setattr(block, "_mlp_group", lambda b, sp, w: None)
    monkeypatch.setattr(
        block, "fused_mlp_split",
        ft.partial(block.fused_mlp_split, interpret=True),
    )
    calls = []
    orig = block.fused_mlp_split_spmd

    def spy(*a, **kw):
        calls.append(1)
        return orig(*a, **kw)

    import wise_tpu.ops.block as block_mod

    monkeypatch.setattr(block_mod, "fused_mlp_split_spmd", spy)

    cfg_x = _tiny_cfg(dtype=jnp.bfloat16)
    cfg_f = _tiny_cfg(dtype=jnp.bfloat16, fused_block=True)
    imgs = jax.random.normal(jax.random.PRNGKey(7), (8, 64, 64, 3))
    toks = jnp.zeros((1, 16), jnp.int32)
    params = CLIP(cfg_x).init(jax.random.PRNGKey(0), imgs[:1], toks)
    want = CLIP(cfg_x).apply(params, imgs, method="encode_image")
    got = CLIP(cfg_f).apply(params, imgs, method="encode_image")
    assert calls, "fused_mlp_split_spmd was not selected"
    cos = (np.asarray(got) * np.asarray(want)).sum(-1)
    assert cos.min() > 0.999, cos.min()


@pytest.fixture
def force_fused_block_padded(monkeypatch):
    """Open the padded-head gate (head_dim 80 class) and run every kernel
    in interpret mode."""
    from wise_tpu.ops import block

    monkeypatch.setattr(
        block, "supports_fused_block_padded",
        lambda b, sp, w, h, dt: jnp.dtype(dt) == jnp.bfloat16
        and (w // h) % 64 != 0 and (w // h) < 128 and sp % 8 == 0,
    )
    # the orchestrator forwards interpret= to every sub-kernel, so one
    # patch covers the LN-matmul/attention/residual-matmul chain
    monkeypatch.setattr(
        block, "fused_attn_block_padded",
        functools.partial(block.fused_attn_block_padded, interpret=True),
    )
    monkeypatch.setattr(
        block, "fused_mlp_block",
        functools.partial(block.fused_mlp_block, interpret=True),
    )


def test_vith_class_padded_block(force_fused_block_padded):
    """A head_dim-80 tower (the ViT-H/xlm-roberta class — the reference's
    default backbone, reference extract-features.py:195-207) takes the
    padded-head all-kernel path and matches the XLA tower."""
    from wise_tpu.models.clip.model import CLIP

    kw = dict(vision_width=160, vision_heads=2)  # head_dim 80
    cfg_x = _tiny_cfg(dtype=jnp.bfloat16, **kw)
    cfg_f = _tiny_cfg(dtype=jnp.bfloat16, fused_block=True, **kw)
    imgs = jax.random.normal(jax.random.PRNGKey(3), (8, 64, 64, 3))
    toks = jnp.zeros((1, 16), jnp.int32)
    params = CLIP(cfg_x).init(jax.random.PRNGKey(0), imgs[:1], toks)
    want = CLIP(cfg_x).apply(params, imgs, method="encode_image")
    got = CLIP(cfg_f).apply(params, imgs, method="encode_image")
    cos = (np.asarray(got) * np.asarray(want)).sum(-1)
    assert cos.min() > 0.999, cos.min()


def test_clap_caption_tower_fused_matches(force_fused_block, monkeypatch):
    """CLAP's GPT2-layout caption tower pads 77->80 and runs the same
    block kernels as the CLIP text tower; last-real-token pooling never
    reads the pad rows, so fused == XLA. Param tree shared."""
    import dataclasses

    from wise_tpu.models.clap.model import CLAPConfig, CaptionEncoder

    cfg = dataclasses.replace(
        CLAPConfig(), vocab_size=128, context_length=13,
        text_width=128, text_heads=2, text_layers=2, dtype=jnp.bfloat16,
    )
    toks = jax.random.randint(jax.random.PRNGKey(0), (4, 13), 1, 127)
    lengths = jnp.array([3, 13, 7, 1])
    enc = CaptionEncoder(cfg)

    monkeypatch.setenv("WISE_FUSED_CLAP_TEXT", "0")
    params = enc.init(jax.random.PRNGKey(1), toks, lengths)
    want = enc.apply(params, toks, lengths)

    monkeypatch.setenv("WISE_FUSED_CLAP_TEXT", "1")
    params_f = enc.init(jax.random.PRNGKey(1), toks, lengths)
    assert jax.tree_util.tree_structure(
        params_f
    ) == jax.tree_util.tree_structure(params)
    got = enc.apply(params, toks, lengths)  # same params: ckpt interop
    want, got = np.asarray(want), np.asarray(got)
    cos = (want * got).sum(-1) / (
        np.linalg.norm(want, axis=-1) * np.linalg.norm(got, axis=-1)
    )
    assert cos.min() > 0.999, cos.min()
