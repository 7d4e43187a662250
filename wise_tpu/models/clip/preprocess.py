"""Fused on-device image preprocessing for CLIP.

Replaces the reference's per-frame PIL Resize/CenterCrop/Normalize pipeline
(src/feature/mlfoundation_openclip.py:81-90) with one jitted JAX function
over the whole frame batch: bicubic resize (shorter side -> target),
center crop, scale to [0,1], channel-normalise. Runs on TPU fused with the
encoder forward, so frames move host->device once as uint8 (4x less PCIe
traffic than float32).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

OPENAI_DATASET_MEAN = (0.48145466, 0.4578275, 0.40821073)
OPENAI_DATASET_STD = (0.26862954, 0.26130258, 0.27577711)


@functools.partial(jax.jit, static_argnames=("target_size",))
def preprocess_images(
    frames: jax.Array,
    target_size: int = 224,
    mean: Tuple[float, ...] = OPENAI_DATASET_MEAN,
    std: Tuple[float, ...] = OPENAI_DATASET_STD,
) -> jax.Array:
    """frames: (B, H, W, 3) uint8 -> (B, S, S, 3) float32 normalised.

    Semantics: Resize(shorter side -> S, bicubic, antialias) + CenterCrop(S),
    computed as crop-first (central min-side square on uint8, then one
    bicubic resize). Crop-first touches only the pixels that survive the
    crop — for 16:9 video frames that is ~44% less resize work — and is
    numerically identical to resize-first except within the bicubic kernel
    footprint at the crop border."""
    b, h, w, c = frames.shape
    square = min(h, w)
    top = (h - square) // 2
    left = (w - square) // 2
    x = jax.lax.dynamic_slice(
        frames, (0, top, left, 0), (b, square, square, c)
    )
    x = x.astype(jnp.float32) / 255.0
    if square != target_size:
        x = jax.image.resize(
            x, (b, target_size, target_size, c), method="bicubic",
            antialias=True,
        )
    mean_a = jnp.asarray(mean, dtype=jnp.float32)
    std_a = jnp.asarray(std, dtype=jnp.float32)
    return (x - mean_a) / std_a


def preprocess_numpy(frames: np.ndarray, target_size: int = 224) -> np.ndarray:
    """Host wrapper."""
    return np.asarray(preprocess_images(jnp.asarray(frames), target_size))
