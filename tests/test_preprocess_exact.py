"""Exact (PIL resize-first) preprocessing path vs the fused device path."""

import numpy as np
import pytest

from wise_tpu.models.clip.preprocess import (
    OPENAI_DATASET_MEAN,
    OPENAI_DATASET_STD,
    preprocess_images_exact,
    preprocess_numpy,
)


def test_constant_image_both_paths_identical():
    """A constant image survives any resample kernel unchanged, so both
    paths must agree to float rounding."""
    img = np.full((1, 300, 400, 3), 180, np.uint8)
    exact = preprocess_images_exact(img, 224)
    fast = preprocess_numpy(img, 224)
    np.testing.assert_allclose(exact, fast, atol=2e-3)
    want = (180 / 255.0 - np.asarray(OPENAI_DATASET_MEAN)) / np.asarray(
        OPENAI_DATASET_STD
    )
    np.testing.assert_allclose(exact[0, 0, 0], want, atol=1e-5)


def test_square_input_is_normalise_only():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (2, 224, 224, 3), dtype=np.uint8)
    exact = preprocess_images_exact(img, 224)
    want = (img / 255.0 - np.asarray(OPENAI_DATASET_MEAN)) / np.asarray(
        OPENAI_DATASET_STD
    )
    np.testing.assert_allclose(exact, want, atol=1e-5)


def test_resize_first_semantics():
    """Shortest side scales to the target (torchvision Resize(int)): a
    landscape frame crops horizontally after the resize, so the two paths
    sample the same central square; outputs stay close on smooth content."""
    h, w = 288, 352
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.clip(
        127 + 80 * np.sin(xx / 23.0) + 60 * np.cos(yy / 17.0), 0, 255
    ).astype(np.uint8)
    img = np.repeat(img[None, :, :, None], 3, axis=3)
    exact = preprocess_images_exact(img, 224)
    fast = preprocess_numpy(img, 224)
    assert exact.shape == fast.shape == (1, 224, 224, 3)
    # same region, different kernels: close but not identical
    assert np.mean(np.abs(exact - fast)) < 0.05
    assert np.corrcoef(exact.ravel(), fast.ravel())[0, 1] > 0.999


def test_preprocess_gemm_matches_resize_within_bf16():
    """The GEMM resize (production bf16 ingest path) applies the EXACT
    extracted jax.image bicubic weights, so its only delta vs
    preprocess_images is the bf16 operand rounding — bounded at a few
    bf16 ulps in normalised units."""
    import jax.numpy as jnp

    from wise_tpu.models.clip.preprocess import preprocess_images_gemm

    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, (2, 48, 64, 3), dtype=np.uint8)
    want = preprocess_numpy(img, 32)
    got = np.asarray(preprocess_images_gemm(jnp.asarray(img), 32),
                     np.float32)
    assert got.shape == (2, 32, 32, 3)
    assert float(np.max(np.abs(got - want))) < 0.08      # ~bf16 band
    assert float(np.mean(np.abs(got - want))) < 0.01


def test_preprocess_gemm_square_input_falls_back_exact():
    """square == target skips the resize entirely, so the GEMM path must
    match preprocess_images to f32 rounding (no bf16 cast anywhere)."""
    import jax.numpy as jnp

    from wise_tpu.models.clip.preprocess import preprocess_images_gemm

    rng = np.random.default_rng(4)
    img = rng.integers(0, 255, (1, 32, 32, 3), dtype=np.uint8)
    want = preprocess_numpy(img, 32)
    got = np.asarray(preprocess_images_gemm(jnp.asarray(img), 32))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_resize_weights_exact_by_linearity():
    """_resize_weights is jax.image.resize applied to identity, so
    W @ x must equal resize(x) for any x (linearity), and bicubic
    preserves constants (rows sum to 1)."""
    import jax
    import jax.numpy as jnp

    from wise_tpu.models.clip.preprocess import _resize_weights

    w = _resize_weights(48, 32)
    assert w.shape == (32, 48)
    np.testing.assert_allclose(w.sum(axis=1), 1.0, atol=1e-5)
    rng = np.random.default_rng(5)
    x = rng.standard_normal((48, 7)).astype(np.float32)
    want = np.asarray(jax.image.resize(
        jnp.asarray(x), (32, 7), method="bicubic", antialias=True))
    np.testing.assert_allclose(w @ x, want, atol=1e-5)


def test_extractor_exact_mode(monkeypatch):
    """WISE_PREPROCESS=exact routes uint8 frames through the PIL path."""
    monkeypatch.setenv("WISE_PREPROCESS", "exact")
    monkeypatch.setenv("WISE_CLIP_DTYPE", "float32")
    import wise_tpu.models.clip.preprocess as pp
    from wise_tpu.models.clip.extractor import OpenClipExtractor

    called = {}
    orig = pp.preprocess_images_exact

    def spy(*a, **kw):
        called["yes"] = True
        return orig(*a, **kw)

    monkeypatch.setattr(pp, "preprocess_images_exact", spy)
    ext = OpenClipExtractor("mlfoundations/open_clip/ViT-B-32/test")
    rng = np.random.default_rng(1)
    frames = rng.integers(0, 255, (2, 240, 320, 3), dtype=np.uint8)
    feats = ext.extract_image_features(frames)
    assert called.get("yes")
    assert feats.shape == (2, 512)
    np.testing.assert_allclose(
        np.linalg.norm(feats, axis=1), 1.0, atol=1e-4
    )
