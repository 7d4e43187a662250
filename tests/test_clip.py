import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wise_tpu.models.clip import CLIP, get_clip_config, preprocess_images
from wise_tpu.models.clip.convert import convert_openclip_state_dict
from wise_tpu.models.clip.tokenizer import HashTokenizer, bytes_to_unicode


@pytest.fixture(scope="module")
def tiny_config():
    from wise_tpu.models.clip.model import CLIPConfig

    return CLIPConfig(
        embed_dim=32,
        image_size=32,
        patch_size=16,
        vision_width=48,
        vision_layers=2,
        vision_heads=4,
        context_length=16,
        vocab_size=128,
        text_width=32,
        text_heads=4,
        text_layers=2,
    )


@pytest.fixture(scope="module")
def tiny_model(tiny_config):
    model = CLIP(tiny_config)
    rng = jax.random.PRNGKey(0)
    params = model.init(
        rng,
        jnp.zeros((1, 32, 32, 3), jnp.float32),
        jnp.zeros((1, 16), jnp.int32),
    )
    return model, params


def test_forward_shapes_and_norm(tiny_model, tiny_config):
    model, params = tiny_model
    imgs = jax.random.normal(jax.random.PRNGKey(1), (3, 32, 32, 3))
    toks = jnp.array([[100, 5, 6, 127] + [0] * 12] * 2, dtype=jnp.int32)
    img_f, txt_f, scale = model.apply(params, imgs, toks)
    assert img_f.shape == (3, 32)
    assert txt_f.shape == (2, 32)
    np.testing.assert_allclose(
        np.linalg.norm(img_f, axis=-1), 1.0, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.linalg.norm(txt_f, axis=-1), 1.0, rtol=1e-5
    )
    assert float(scale) == pytest.approx(np.exp(np.log(1 / 0.07)), rel=1e-5)


def test_text_pooling_at_eot(tiny_model):
    """Pooling uses argmax(token id) == EOT position; changing tokens after
    EOT must not change the embedding (causal mask + argmax pooling)."""
    model, params = tiny_model
    toks1 = jnp.array([[100, 5, 6, 127, 0, 0, 0, 0] + [0] * 8], dtype=jnp.int32)
    toks2 = jnp.array([[100, 5, 6, 127, 9, 9, 9, 9] + [0] * 8], dtype=jnp.int32)
    f1 = model.apply(params, toks1, method=CLIP.encode_text)
    f2 = model.apply(params, toks2, method=CLIP.encode_text)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2), atol=1e-5)


def test_causal_mask(tiny_model):
    """Changing a token BEFORE the pooled position must change the output."""
    model, params = tiny_model
    toks1 = jnp.array([[100, 5, 6, 127] + [0] * 12], dtype=jnp.int32)
    toks2 = jnp.array([[100, 7, 6, 127] + [0] * 12], dtype=jnp.int32)
    f1 = model.apply(params, toks1, method=CLIP.encode_text)
    f2 = model.apply(params, toks2, method=CLIP.encode_text)
    assert not np.allclose(np.asarray(f1), np.asarray(f2), atol=1e-4)


def _fake_torch_state_dict(c):
    """Construct a state dict with open_clip's exact key names/shapes."""
    rng = np.random.default_rng(0)
    sd = {}

    def w(name, *shape):
        sd[name] = rng.standard_normal(shape).astype(np.float32) * 0.02

    grid = c.image_size // c.patch_size
    w("visual.conv1.weight", c.vision_width, 3, c.patch_size, c.patch_size)
    w("visual.class_embedding", c.vision_width)
    w("visual.positional_embedding", grid * grid + 1, c.vision_width)
    w("visual.proj", c.vision_width, c.embed_dim)
    for p in ("visual.ln_pre", "visual.ln_post"):
        w(p + ".weight", c.vision_width)
        w(p + ".bias", c.vision_width)
    for i in range(c.vision_layers):
        p = f"visual.transformer.resblocks.{i}"
        for ln in (".ln_1", ".ln_2"):
            w(p + ln + ".weight", c.vision_width)
            w(p + ln + ".bias", c.vision_width)
        w(p + ".attn.in_proj_weight", 3 * c.vision_width, c.vision_width)
        w(p + ".attn.in_proj_bias", 3 * c.vision_width)
        w(p + ".attn.out_proj.weight", c.vision_width, c.vision_width)
        w(p + ".attn.out_proj.bias", c.vision_width)
        w(p + ".mlp.c_fc.weight", 4 * c.vision_width, c.vision_width)
        w(p + ".mlp.c_fc.bias", 4 * c.vision_width)
        w(p + ".mlp.c_proj.weight", c.vision_width, 4 * c.vision_width)
        w(p + ".mlp.c_proj.bias", c.vision_width)
    w("token_embedding.weight", c.vocab_size, c.text_width)
    w("positional_embedding", c.context_length, c.text_width)
    w("text_projection", c.text_width, c.embed_dim)
    w("ln_final.weight", c.text_width)
    w("ln_final.bias", c.text_width)
    for i in range(c.text_layers):
        p = f"transformer.resblocks.{i}"
        for ln in (".ln_1", ".ln_2"):
            w(p + ln + ".weight", c.text_width)
            w(p + ln + ".bias", c.text_width)
        w(p + ".attn.in_proj_weight", 3 * c.text_width, c.text_width)
        w(p + ".attn.in_proj_bias", 3 * c.text_width)
        w(p + ".attn.out_proj.weight", c.text_width, c.text_width)
        w(p + ".attn.out_proj.bias", c.text_width)
        w(p + ".mlp.c_fc.weight", 4 * c.text_width, c.text_width)
        w(p + ".mlp.c_fc.bias", 4 * c.text_width)
        w(p + ".mlp.c_proj.weight", c.text_width, 4 * c.text_width)
        w(p + ".mlp.c_proj.bias", c.text_width)
    sd["logit_scale"] = np.float32(np.log(1 / 0.07))
    return sd


def test_converter_param_tree_matches_model(tiny_config):
    """Converted params must be accepted verbatim by the Flax model (same
    tree structure and shapes as model.init)."""
    sd = _fake_torch_state_dict(tiny_config)
    params = {"params": convert_openclip_state_dict(sd, tiny_config)}
    model = CLIP(tiny_config)
    init = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 32, 32, 3), jnp.float32),
        jnp.zeros((1, 16), jnp.int32),
    )
    flat_init = jax.tree_util.tree_leaves_with_path(init)
    flat_conv = jax.tree_util.tree_leaves_with_path(params)
    paths_init = {jax.tree_util.keystr(p): v.shape for p, v in flat_init}
    paths_conv = {jax.tree_util.keystr(p): np.shape(v) for p, v in flat_conv}
    assert paths_init == paths_conv
    # and the model runs with converted params
    out = model.apply(
        params, jnp.ones((2, 32, 32, 3)), method=CLIP.encode_image
    )
    assert out.shape == (2, 32)
    assert np.isfinite(np.asarray(out)).all()


def test_converted_matmul_semantics(tiny_config):
    """A torch Linear y = x W^T + b must equal our Dense with kernel = W.T:
    verify end-to-end on the text tower vs a numpy reference of the first
    attention in-projection."""
    sd = _fake_torch_state_dict(tiny_config)
    params = {"params": convert_openclip_state_dict(sd, tiny_config)}
    # numpy: embed + pos, ln_1, then in_proj of block 0
    toks = np.array([[100, 5, 127] + [0] * 13], dtype=np.int32)
    x = sd["token_embedding.weight"][toks[0]] + sd["positional_embedding"]
    g, b = sd["transformer.resblocks.0.ln_1.weight"], sd[
        "transformer.resblocks.0.ln_1.bias"
    ]
    mu = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    y = (x - mu) / np.sqrt(var + 1e-5) * g + b
    ref = y @ sd["transformer.resblocks.0.attn.in_proj_weight"].T + sd[
        "transformer.resblocks.0.attn.in_proj_bias"
    ]
    # flax: run in_proj via module apply on intermediate
    import flax.linen as fnn

    dense = fnn.Dense(3 * tiny_config.text_width, name="in_proj")
    flax_out = dense.apply(
        {
            "params": params["params"]["text"]["transformer"]["resblocks_0"][
                "attn"
            ]["in_proj"]
        },
        jnp.asarray(y),
    )
    np.testing.assert_allclose(np.asarray(flax_out), ref, atol=2e-4)


def test_preprocess_images_shapes():
    frames = np.random.default_rng(0).integers(
        0, 255, (2, 48, 64, 3), dtype=np.uint8
    )
    out = np.asarray(preprocess_images(jnp.asarray(frames), 32))
    assert out.shape == (2, 32, 32, 3)
    # normalised values within plausible range
    assert -3.0 < out.min() < 0.0 < out.max() < 3.0


def test_hash_tokenizer_deterministic():
    tok = HashTokenizer(vocab_size=1000, context_length=8)
    a = tok(["hello world"])
    b = tok(["hello world"])
    np.testing.assert_array_equal(a, b)
    assert a[0, 0] == 998  # SOT
    assert 999 in a[0]     # EOT present
    c = tok(["different text"])
    assert not np.array_equal(a, c)


def test_bytes_to_unicode_bijective():
    table = bytes_to_unicode()
    assert len(table) == 256
    assert len(set(table.values())) == 256


def test_extractor_random_weights_end_to_end(monkeypatch, tmp_path):
    """Full extractor path with random weights on a tiny ViT config."""
    monkeypatch.setenv("WISE_CHECKPOINT_DIR", str(tmp_path))  # no checkpoints
    from wise_tpu.models.clip import model as clip_model

    tiny = clip_model.CLIPConfig(
        embed_dim=16, image_size=32, patch_size=16, vision_width=32,
        vision_layers=1, vision_heads=2, context_length=8, vocab_size=64,
        text_width=16, text_heads=2, text_layers=1,
    )
    monkeypatch.setitem(clip_model.CLIP_CONFIGS, "ViT-TINY", tiny)
    from wise_tpu.models.clip.extractor import OpenClipExtractor

    fe = OpenClipExtractor("mlfoundations/open_clip/ViT-TINY/test")
    imgs = np.random.default_rng(0).integers(
        0, 255, (3, 40, 50, 3), dtype=np.uint8
    )
    feats = fe.extract_image_features(fe.preprocess_image(imgs))
    assert feats.shape == (3, 16)
    np.testing.assert_allclose(np.linalg.norm(feats, axis=1), 1.0, rtol=1e-4)
    # deterministic across calls and unaffected by batch padding
    feats2 = fe.extract_image_features(imgs[:1])
    np.testing.assert_allclose(feats[0], feats2[0], atol=1e-5)

    txt = fe.extract_text_features(["a dog", "a cat"])
    assert txt.shape == (2, 16)
    np.testing.assert_allclose(np.linalg.norm(txt, axis=1), 1.0, rtol=1e-4)
