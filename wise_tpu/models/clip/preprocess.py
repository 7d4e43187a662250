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
    """frames: (B, H, W, 3) uint8 -> (B, S, S, 3) float32 normalised."""
    x = frames.astype(jnp.float32) / 255.0
    b, h, w, c = x.shape
    # resize shorter side to target_size, preserving aspect ratio
    scale = target_size / min(h, w)
    new_h = max(target_size, int(round(h * scale)))
    new_w = max(target_size, int(round(w * scale)))
    x = jax.image.resize(x, (b, new_h, new_w, c), method="bicubic", antialias=True)
    # center crop
    top = (new_h - target_size) // 2
    left = (new_w - target_size) // 2
    x = jax.lax.dynamic_slice(
        x, (0, top, left, 0), (b, target_size, target_size, c)
    )
    mean_a = jnp.asarray(mean, dtype=jnp.float32)
    std_a = jnp.asarray(std, dtype=jnp.float32)
    return (x - mean_a) / std_a


def preprocess_numpy(frames: np.ndarray, target_size: int = 224) -> np.ndarray:
    """Host wrapper."""
    return np.asarray(preprocess_images(jnp.asarray(frames), target_size))
