"""Caption-pair batching for the train CLI (pipeline/train_data.py)."""

import numpy as np

from wise_tpu.models.clip.tokenizer import get_tokenizer
from wise_tpu.pipeline import train_data


def _tok():
    return get_tokenizer(None, vocab_size=64, context_length=8)


def test_partial_batches_carry_across_epochs(monkeypatch):
    """A corpus smaller than batch_size must still fill batches by cycling
    epochs (regression: per-epoch resets discarded every partial batch and
    a 2-segment project trained 0 steps)."""
    monkeypatch.setattr(
        train_data, "sample_frame",
        lambda path, mid, size: np.full((size, size, 3), 7, np.uint8),
    )
    segments = [("a.mp4", 1.0, "cooking"), ("b.mp4", 2.0, "driving")]
    batches = list(
        train_data.caption_batches(segments, _tok(), batch_size=8,
                                   image_size=16, epochs=8)
    )
    # 2 segments x 8 epochs = 16 samples -> exactly two batches of 8
    assert len(batches) == 2
    for imgs, toks in batches:
        assert imgs.shape == (8, 16, 16, 3)
        assert toks.shape[0] == 8


def test_undecodable_segments_skipped(monkeypatch):
    monkeypatch.setattr(
        train_data, "sample_frame",
        lambda path, mid, size: (
            None if path == "bad.mp4"
            else np.zeros((size, size, 3), np.uint8)
        ),
    )
    segments = [("bad.mp4", 0.0, "x"), ("ok.mp4", 1.0, "y")]
    batches = list(
        train_data.caption_batches(segments, _tok(), batch_size=2,
                                   image_size=8, epochs=4)
    )
    # only 'ok' contributes: 4 epochs -> 4 samples -> 2 batches of 2
    assert len(batches) == 2


def test_training_clip_config_kernel_defaults(monkeypatch):
    """bf16 single-program training enables the block kernels + pooled
    last layer by default (round-4 saved-activation backward, A/B 1.042x
    — cli/train.training_clip_config); f32, pp>1, and the env
    kill-switches all keep them off."""
    import jax.numpy as jnp

    from wise_tpu.cli.train import training_clip_config

    monkeypatch.delenv("WISE_FUSED_BLOCK", raising=False)
    monkeypatch.delenv("WISE_POOL_LAST", raising=False)

    cfg = training_clip_config("ViT-B-32")
    assert cfg.dtype == jnp.bfloat16
    assert cfg.fused_block and cfg.pool_last_block

    f32 = training_clip_config("ViT-B-32", dtype="float32")
    assert f32.dtype == jnp.float32
    assert not f32.fused_block and not f32.pool_last_block

    pp = training_clip_config("ViT-B-32", pp=2)
    assert not pp.fused_block and not pp.pool_last_block

    monkeypatch.setenv("WISE_FUSED_BLOCK", "0")
    monkeypatch.setenv("WISE_POOL_LAST", "0")
    off = training_clip_config("ViT-B-32")
    assert not off.fused_block and not off.pool_last_block
