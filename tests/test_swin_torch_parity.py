"""Numerics parity: our Swin blocks (HTSAT audio encoder core) vs
transformers' SwinLayer — validates window partitioning, relative position
bias, the shifted-window attention mask, and the pre-LN block wiring.

Mapping notes (documented for the CLAP/HTSAT weight converter):
- torch qkv Linear is fused per q/k/v in HF (query/key/value); ours is one
  fused qkv Dense -> split columns.
- HF stores the relative bias table as (table, heads) like ours.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch

from wise_tpu.models.clap.model import SwinBlock

DIM, HEADS, WINDOW = 32, 4, 4
RES = (8, 8)


def _t(x):
    return torch.tensor(np.asarray(x, dtype=np.float32))


def build_torch_layer(flax_params, shift):
    from transformers.models.swin.modeling_swin import SwinConfig, SwinLayer

    cfg = SwinConfig(
        embed_dim=DIM,
        window_size=WINDOW,
        num_heads=[HEADS],
        hidden_act="gelu",
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
        drop_path_rate=0.0,
        mlp_ratio=4.0,
        layer_norm_eps=1e-5,
    )
    layer = SwinLayer(
        cfg, dim=DIM, input_resolution=RES, num_heads=HEADS,
        shift_size=shift,
    ).eval()
    p = flax_params["params"]
    sd = {}
    qkv_k = np.asarray(p["attn"]["qkv"]["kernel"])  # (D, 3D)
    qkv_b = np.asarray(p["attn"]["qkv"]["bias"])
    for j, name in enumerate(("query", "key", "value")):
        sd[f"attention.self.{name}.weight"] = _t(
            qkv_k[:, j * DIM : (j + 1) * DIM]
        ).T
        sd[f"attention.self.{name}.bias"] = _t(qkv_b[j * DIM : (j + 1) * DIM])
    sd["attention.self.relative_position_bias_table"] = _t(
        p["attn"]["relative_position_bias_table"]
    )
    sd["attention.output.dense.weight"] = _t(p["attn"]["proj"]["kernel"]).T
    sd["attention.output.dense.bias"] = _t(p["attn"]["proj"]["bias"])
    sd["layernorm_before.weight"] = _t(p["norm1"]["scale"])
    sd["layernorm_before.bias"] = _t(p["norm1"]["bias"])
    sd["layernorm_after.weight"] = _t(p["norm2"]["scale"])
    sd["layernorm_after.bias"] = _t(p["norm2"]["bias"])
    sd["intermediate.dense.weight"] = _t(p["mlp_fc1"]["kernel"]).T
    sd["intermediate.dense.bias"] = _t(p["mlp_fc1"]["bias"])
    sd["output.dense.weight"] = _t(p["mlp_fc2"]["kernel"]).T
    sd["output.dense.bias"] = _t(p["mlp_fc2"]["bias"])
    missing, unexpected = layer.load_state_dict(sd, strict=False)
    real_missing = [m for m in missing if "relative_position_index" not in m]
    assert not real_missing, real_missing
    assert not unexpected, unexpected
    return layer


def test_patch_merging_matches_torch():
    from transformers.models.swin.modeling_swin import (
        SwinConfig,
        SwinPatchMerging,
    )

    from wise_tpu.models.clap.model import PatchMerging

    merge = PatchMerging(input_resolution=RES)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, RES[0] * RES[1], DIM)).astype(np.float32)
    params = merge.init(jax.random.PRNGKey(0), jnp.asarray(x))
    tm = SwinPatchMerging(
        input_resolution=RES, dim=DIM,
        norm_layer=torch.nn.LayerNorm,
    ).eval()
    # HF merges then norms AFTER reduction? inspect: SwinPatchMerging applies
    # reduction(norm(x)) in original Swin order — map both weights
    sd = {
        "reduction.weight": _t(
            np.asarray(params["params"]["reduction"]["kernel"])
        ).T,
        "norm.weight": _t(params["params"]["norm"]["scale"]),
        "norm.bias": _t(params["params"]["norm"]["bias"]),
    }
    missing, unexpected = tm.load_state_dict(sd, strict=False)
    assert not missing and not unexpected, (missing, unexpected)
    ours = np.asarray(merge.apply(params, jnp.asarray(x)))
    with torch.inference_mode():
        theirs = tm(torch.tensor(x), RES).numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-4, rtol=1e-3)


def test_swin_block_window_equals_resolution_clamps_shift():
    """When one window covers the whole resolution, torch Swin/HTSAT clamp
    shift to 0 (HF SwinLayer.set_shift_and_window_size, HTS-AT
    SwinTransformerBlock.__init__) — HTSAT stage 3 (res 8, window 8) hits
    this. Our SwinBlock must degrade its shifted blocks identically or
    published CLAP checkpoints diverge at stage 3 (regression: we used to
    run a shift-4 mask there)."""
    res = (WINDOW, WINDOW)
    block = SwinBlock(
        dim=DIM, heads=HEADS, window=WINDOW, shift=WINDOW // 2,
        input_resolution=res,
    )
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, WINDOW * WINDOW, DIM)).astype(np.float32)
    params = block.init(jax.random.PRNGKey(0), jnp.asarray(x))
    layer = build_torch_layer(params, WINDOW // 2)
    ours = np.asarray(block.apply(params, jnp.asarray(x)))
    with torch.inference_mode():
        theirs = layer(torch.tensor(x), input_dimensions=res)[0].numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-4, rtol=1e-3)


@pytest.mark.parametrize("shift", [0, WINDOW // 2])
def test_swin_block_matches_torch(shift):
    block = SwinBlock(
        dim=DIM, heads=HEADS, window=WINDOW, shift=shift,
        input_resolution=RES,
    )
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, RES[0] * RES[1], DIM)).astype(np.float32)
    params = block.init(jax.random.PRNGKey(0), jnp.asarray(x))
    layer = build_torch_layer(params, shift)
    ours = np.asarray(block.apply(params, jnp.asarray(x)))
    with torch.inference_mode():
        theirs = layer(
            torch.tensor(x), input_dimensions=RES
        )[0].numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-4, rtol=1e-3)
