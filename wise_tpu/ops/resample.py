"""Linear waveform resampling as a gather (O(n) memory).

jax.image.resize materialises a dense (in, out) interpolation matrix for
non-integer scales — 135 GB for a 48k->44.1k 4 s segment — so audio rate
conversion uses this explicit gather+lerp instead.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("n_out",))
def resample_linear(wav: jax.Array, n_out: int) -> jax.Array:
    """wav (B, T) -> (B, n_out) by linear interpolation over [0, T-1]."""
    n_in = wav.shape[1]
    pos = jnp.linspace(0.0, n_in - 1.0, n_out)
    i0 = jnp.floor(pos).astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, n_in - 1)
    frac = (pos - i0).astype(wav.dtype)
    return wav[:, i0] * (1.0 - frac) + wav[:, i1] * frac
