import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wise_tpu.models.clap.model import (
    CLAP,
    CLAPConfig,
    _relative_position_index,
    _shift_attn_mask,
    window_partition,
    window_reverse,
)


@pytest.fixture(scope="module")
def tiny_config():
    return CLAPConfig(
        joint_dim=32,
        spec_frames=64,
        freq_ratio=2,
        n_mels=32,
        patch_size=4,
        embed_dim=16,
        depths=(1, 1),
        num_heads=(2, 4),
        window_size=4,
        vocab_size=128,
        context_length=12,
        text_width=32,
        text_heads=4,
        text_layers=2,
    )


@pytest.fixture(scope="module")
def tiny_model(tiny_config):
    model = CLAP(tiny_config)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 16, tiny_config.n_mels), jnp.float32),
        jnp.zeros((1, tiny_config.context_length), jnp.int32),
        jnp.ones((1,), jnp.int32),
    )
    return model, params


def test_window_partition_round_trip():
    x = jnp.arange(2 * 8 * 8 * 3, dtype=jnp.float32).reshape(2, 8, 8, 3)
    w = window_partition(x, 4)
    assert w.shape == (2 * 4, 16, 3)
    back = window_reverse(w, 4, 8, 8)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_relative_position_index():
    idx = _relative_position_index(3)
    assert idx.shape == (9, 9)
    assert idx.min() >= 0 and idx.max() < 25
    # symmetric pairs map to mirrored offsets, diagonal is the centre index
    assert (np.diag(idx) == idx[0, 0]).all()


def test_shift_mask_blocks_cross_region():
    mask = _shift_attn_mask(8, 8, 4, 2)
    assert mask.shape == (4, 16, 16)
    assert (mask == 0).any() and (mask == -100.0).any()
    # the top-left window is contiguous: fully visible
    np.testing.assert_array_equal(mask[0], np.zeros((16, 16)))


def test_clap_forward_shapes(tiny_model, tiny_config):
    model, params = tiny_model
    mel = jax.random.normal(jax.random.PRNGKey(1), (2, 48, tiny_config.n_mels))
    toks = jnp.array(
        [[5, 9, 3, 0, 0, 0, 0, 0, 0, 0, 0, 0]] * 3, dtype=jnp.int32
    )
    lens = jnp.array([3, 3, 3], dtype=jnp.int32)
    a, t, scale = model.apply(params, mel, toks, lens)
    assert a.shape == (2, 32)
    assert t.shape == (3, 32)
    np.testing.assert_allclose(np.linalg.norm(a, axis=1), 1.0, rtol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(t, axis=1), 1.0, rtol=1e-5)


def test_text_pool_ignores_padding(tiny_model, tiny_config):
    model, params = tiny_model
    t1 = jnp.array([[5, 9, 3] + [0] * 9], dtype=jnp.int32)
    t2 = jnp.array([[5, 9, 3] + [7] * 9], dtype=jnp.int32)
    l = jnp.array([3], dtype=jnp.int32)
    f1 = model.apply(params, t1, l, method=CLAP.encode_text)
    f2 = model.apply(params, t2, l, method=CLAP.encode_text)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2), atol=1e-5)


def test_caption_pool_last_block_matches_full(tiny_model, tiny_config):
    """pool_last_block=True: the caption tower's dynamic pooled-row last
    layer must reproduce the full tower for per-caption varying lengths
    (same params — the flag only changes how the last layer is computed)."""
    import dataclasses as dc

    model, params = tiny_model
    toks = jnp.array(
        [
            [5, 9, 3, 0, 0, 0, 0, 0, 0, 0, 0, 0],
            [5, 9, 3, 8, 2, 6, 4, 1, 7, 9, 2, 3],
            [5, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
        ],
        dtype=jnp.int32,
    )
    lens = jnp.array([3, 12, 1], dtype=jnp.int32)
    want = model.apply(params, toks, lens, method=CLAP.encode_text)
    pooled_model = CLAP(dc.replace(tiny_config, pool_last_block=True))
    got = pooled_model.apply(params, toks, lens, method=CLAP.encode_text)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5
    )
    # parameter tree unchanged by the flag
    p2 = pooled_model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 16, tiny_config.n_mels), jnp.float32),
        toks[:1], lens[:1],
    )
    assert jax.tree_util.tree_structure(p2) == jax.tree_util.tree_structure(
        params
    )


def test_clap_extractor_end_to_end(monkeypatch, tmp_path):
    monkeypatch.setenv("WISE_CHECKPOINT_DIR", str(tmp_path))
    from wise_tpu.models.clap import model as clap_model

    tiny = CLAPConfig(
        joint_dim=16, duration=1.0, spec_frames=64, freq_ratio=2, n_mels=32,
        patch_size=4, embed_dim=16, depths=(1, 1), num_heads=(2, 2),
        window_size=4, vocab_size=64, context_length=8, text_width=16,
        text_heads=2, text_layers=1,
    )
    monkeypatch.setitem(clap_model.CLAP_CONFIGS, "tiny", tiny)
    from wise_tpu.models.clap.extractor import ClapExtractor

    fe = ClapExtractor("microsoft/clap/tiny/test")
    wav = np.sin(
        2 * np.pi * 440 * np.arange(48_000 * 4) / 48_000
    ).astype(np.float32)
    feats = fe.extract_audio_features(fe.preprocess_audio(wav))
    assert feats.shape == (1, 16)
    np.testing.assert_allclose(np.linalg.norm(feats, axis=1), 1.0, rtol=1e-4)
    # determinism + batch-padding invariance
    feats2 = fe.extract_audio_features(np.stack([wav, wav]))
    np.testing.assert_allclose(feats[0], feats2[1], atol=1e-5)

    txt = fe.extract_text_features(["dog barking", "violin"])
    assert txt.shape == (2, 16)
    assert not np.allclose(txt[0], txt[1])


def test_factory_routes_clap(monkeypatch, tmp_path):
    monkeypatch.setenv("WISE_CHECKPOINT_DIR", str(tmp_path))
    from wise_tpu.models.clap import model as clap_model

    tiny = CLAPConfig(
        joint_dim=16, duration=1.0, spec_frames=64, freq_ratio=2, n_mels=32,
        patch_size=4, embed_dim=16, depths=(1, 1), num_heads=(2, 2),
        window_size=4, vocab_size=64, context_length=8, text_width=16,
        text_heads=2, text_layers=1,
    )
    monkeypatch.setitem(clap_model.CLAP_CONFIGS, "tiny2", tiny)
    from wise_tpu.models import FeatureExtractorFactory
    from wise_tpu.models.clap.extractor import ClapExtractor

    fe = FeatureExtractorFactory("microsoft/clap/tiny2/x")
    assert isinstance(fe, ClapExtractor)
    assert fe.output_dim == 16
