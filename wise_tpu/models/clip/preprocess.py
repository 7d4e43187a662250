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


@functools.lru_cache(maxsize=16)
def _resize_weights(src: int, dst: int) -> np.ndarray:
    """Exact separable weights of jax.image's antialiased bicubic resize:
    the resize is LINEAR per axis, so resizing an identity matrix yields
    that axis's full (dst, src) weight matrix — the GEMM path below is the
    same map by construction, not a reimplementation of the kernel math.
    ensure_compile_time_eval keeps the one-time extraction eager even when
    the caller is being traced under an outer jit."""
    with jax.ensure_compile_time_eval():
        eye = jnp.eye(src, dtype=jnp.float32)
        w = jax.image.resize(eye, (dst, src), method="bicubic",
                             antialias=True)
        return np.asarray(w)


def preprocess_images_gemm(
    frames: jax.Array,
    target_size: int = 224,
    mean: Tuple[float, ...] = OPENAI_DATASET_MEAN,
    std: Tuple[float, ...] = OPENAI_DATASET_STD,
) -> jax.Array:
    """preprocess_images with the bicubic resize applied as two bf16
    GEMMs (Wh @ x @ Ww, exact extracted weights — see _resize_weights).

    Measured on the v5e (scripts/bench_preprocess_variants.py, batch 512
    256x320 -> 224): 1.14 ms vs 2.87 ms for jax.image.resize — the
    general scale-and-translate lowering never reaches the MXU, the
    einsums do. The bf16 operands bound the pixel delta at ~bf16 ulp
    (max|d| 4.5e-2 in normalised units ≈ 1.2e-2 raw, i.e. ~3/255 grey
    levels); production bf16 towers quantise activations to bf16 anyway,
    and the embedding delta is measured on hardware (BENCHMARKS.md,
    round 3) — this is the production ingest path for bf16 towers
    (extractor.py; WISE_PREPROCESS_GEMM=0 opts out). Parity/f32 paths
    keep preprocess_images."""
    b, h, w, c = frames.shape
    square = min(h, w)
    if square == target_size:
        return preprocess_images(frames, target_size, mean, std)
    top = (h - square) // 2
    left = (w - square) // 2
    x = jax.lax.dynamic_slice(
        frames, (0, top, left, 0), (b, square, square, c)
    )
    # weak-typed 255.0 keeps the division in bf16 (a np scalar would
    # promote to f32 and the first einsum would run mixed-precision)
    x = x.astype(jnp.bfloat16) / 255.0
    wh = jnp.asarray(_resize_weights(square, target_size), jnp.bfloat16)
    x = jnp.einsum(
        "Hh,bhwc->bHwc", wh, x, preferred_element_type=jnp.float32
    ).astype(jnp.bfloat16)
    x = jnp.einsum(
        "wW,bHwc->bHWc", wh.T, x, preferred_element_type=jnp.float32
    )
    mean_a = jnp.asarray(mean, dtype=jnp.float32)
    std_a = jnp.asarray(std, dtype=jnp.float32)
    return (x - mean_a) / std_a


def preprocess_images_exact(
    frames: np.ndarray,
    target_size: int = 224,
    mean: Tuple[float, ...] = OPENAI_DATASET_MEAN,
    std: Tuple[float, ...] = OPENAI_DATASET_STD,
) -> np.ndarray:
    """Bit-faithful replica of the reference preprocessing
    (src/feature/mlfoundation_openclip.py:81-90 -> open_clip
    ``image_transform``): PIL shortest-side bicubic resize (PIL's resample IS
    the antialiased convolution torchvision delegates to on PIL inputs) ->
    torchvision-style center crop -> ToTensor -> Normalize.

    Host-side and per-frame — use for parity audits and query-image embedding
    (WISE_PREPROCESS=exact), not for ingest throughput; the fused device path
    (``preprocess_images``, crop-first) is the production route. The
    rank-order delta between the two is measured by
    scripts/eval/preprocess_delta.py."""
    from PIL import Image

    frames = np.asarray(frames)
    if frames.ndim == 3:
        frames = frames[None]
    s = target_size
    mean_a = np.asarray(mean, np.float32)
    std_a = np.asarray(std, np.float32)
    out = np.empty((len(frames), s, s, 3), np.float32)
    for i, f in enumerate(frames):
        im = Image.fromarray(np.ascontiguousarray(f))
        w, h = im.size
        if (w, h) != (s, s):
            if w <= h:  # torchvision Resize(int): short side -> s
                new_w, new_h = s, int(s * h / w)
            else:
                new_w, new_h = int(s * w / h), s
            im = im.resize((new_w, new_h), Image.BICUBIC)
            arr = np.asarray(im, dtype=np.float32)
            top = int(round((new_h - s) / 2.0))
            left = int(round((new_w - s) / 2.0))
            arr = arr[top : top + s, left : left + s]
        else:
            arr = np.asarray(im, dtype=np.float32)
        out[i] = (arr / 255.0 - mean_a) / std_a
    return out
