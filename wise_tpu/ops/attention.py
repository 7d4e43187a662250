"""Fused short-sequence multi-head attention (Pallas TPU kernel).

Motivation (BENCHMARKS.md roofline section): at ViT-B/32 step shapes
(batch 512, 50 tokens, 12 heads of 64), XLA's attention middle
(logits einsum -> softmax -> AV einsum) costs ~1.8-2.5 ms per layer against
a ~0.6 ms GEMM floor — the (B, H, 50, 50) logits tensor is materialised in
HBM with its 50-wide key axis padded to 128 lanes, plus head split/merge
relayouts. This kernel consumes q/k/v in their NATURAL (B, S, H*hd) layout,
slices heads inside VMEM, runs per-head batched MXU dots, and never writes
logits to HBM. Measured 0.43 ms vs 1.77 ms for the XLA middle at the same
shapes on a v5e chip (4.1x), bf16-exact vs the XLA path.

Scope: inference path of short-sequence towers — requires head_dim 64,
token count <= MAX_TOKENS (VMEM budget), batch % GROUP == 0, bf16 compute.
Everything else (f32 parity mode, large towers, training backward) uses
the standard XLA path (``xla_attention``). The vision tower pads its token
axis to a sublane multiple and passes the true count as ``n_valid``; the
kernel masks padded KEY columns with -inf (padded QUERY rows produce
garbage that pooling never reads).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GROUP = 8          # batches per grid step
MAX_TOKENS = 64    # VMEM budget gate (covers the 224px /32 family: 50)


def supports_fused(batch: int, seq_pad: int, width: int, heads: int,
                   dtype) -> bool:
    """Static gate: shapes/dtype the kernel is built and measured for."""
    return (
        jnp.dtype(dtype) == jnp.bfloat16
        and width % heads == 0
        and width // heads == 64
        and seq_pad % 8 == 0
        and seq_pad <= MAX_TOKENS
        and batch % GROUP == 0
        and batch > 0
        and jax.default_backend() == "tpu"
    )


def _kernel(q_ref, k_ref, v_ref, o_ref, *, heads: int, n_valid: int,
            scale: float):
    q = q_ref[:]                       # (GROUP, SP, D) bf16
    k = k_ref[:]
    v = v_ref[:]
    g, sp, d = q.shape
    hd = d // heads
    col = jax.lax.broadcasted_iota(jnp.int32, (g, sp, sp), 2)
    for h in range(heads):
        sl = slice(h * hd, (h + 1) * hd)
        logits = jax.lax.dot_general(
            q[:, :, sl], k[:, :, sl],
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                              # (GROUP, SP, SP) f32
        logits = jnp.where(col < n_valid, logits * scale, -jnp.inf)
        m = jnp.max(logits, axis=2, keepdims=True)
        p = jnp.exp(logits - m)
        p = p / jnp.sum(p, axis=2, keepdims=True)
        o_ref[:, :, sl] = jax.lax.dot_general(
            p.astype(v.dtype), v[:, :, sl],
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("heads", "n_valid", "interpret")
)
def fused_short_attention(
    q: jax.Array, k: jax.Array, v: jax.Array,
    heads: int, n_valid: int, interpret: bool = False,
) -> jax.Array:
    """q/k/v (B, SP, D) bf16 natural layout -> (B, SP, D). Key columns
    >= n_valid are masked; query rows >= n_valid return garbage the caller
    must not read. Gate with supports_fused() first."""
    b, sp, d = q.shape
    hd = d // heads
    spec = pl.BlockSpec((GROUP, sp, d), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(
            _kernel, heads=heads, n_valid=n_valid,
            scale=1.0 / np.sqrt(hd),
        ),
        grid=(b // GROUP,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, sp, d), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * sp * sp * d,
            bytes_accessed=4 * b * sp * d * q.dtype.itemsize,
            transcendentals=b * heads * sp * sp,
        ),
    )(q, k, v)


def xla_attention(q, k, v, heads: int, mask=None, softmax_f32: bool = True,
                  out_dtype=None):
    """Reference XLA path, same (B, S, D)->(B, S, D) contract (used for
    f32 parity mode, training, and every shape the kernel doesn't cover)."""
    b, s, d = q.shape
    hd = d // heads

    def split(t):
        return t.reshape(b, s, heads, hd)

    qh, kh, vh = map(split, (q, k, v))
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", qh, kh, precision=jax.lax.Precision.DEFAULT
    ) * (1.0 / np.sqrt(hd))
    if mask is not None:
        logits = logits + mask.astype(logits.dtype)
    if softmax_f32:
        p = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(
            out_dtype or q.dtype
        )
    else:
        p = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", p, vh).reshape(b, s, d)
