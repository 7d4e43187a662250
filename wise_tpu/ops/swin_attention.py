"""Fused Swin window attention (Pallas TPU) — CLAP's HTSAT middle.

The HTSAT tower (models/clap/model.py) runs window attention over
(B*nH*nW, 64, C) window batches with a learned relative-position bias per
head and, on shifted blocks, an additive per-window mask. XLA materialises
the (N, heads, 64, 64) logits in HBM per block; this kernel mirrors the
CLIP fused-attention design (ops/attention.py): qkv projection, per-head
attention with bias/mask, and the output projection all run in one VMEM
program per window group — logits never touch HBM.

Differences from the CLIP kernel:
- head_dim is 24 at every HTSAT stage (96/4 .. 768/32), so per-head lane
  slices are NOT 64-aligned; measured on v5e the unaligned slices are fine:
  the fused tower runs 14.9-16.7 ms vs 17.1-17.3 ms XLA at batch 32
  (interleaved A/B, scripts/profile_clap.py --swin-ab), so the kernel is ON
  by default (WISE_FUSED_SWIN=0 opts out) — see BENCHMARKS.md CLAP section.
- the relative-position bias is a fixed (heads, L, L) tensor per layer
  (precomputed from the bias table by the caller).
- the shift mask varies WITHIN a window batch with period n_win, so the
  mask rides in as a grid-blocked input with index map i % (n_win/g); the
  group size must divide n_win.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 10_000_000

#: Trace-time engagement counter, bumped by the caller (models/clap/model.py)
#: each time a WindowAttention trace takes the fused branch. A/B harnesses
#: (scripts/profile_clap.py --swin-ab) read it to assert the kernel really
#: engaged — supports_fused_swin() falls back to XLA silently, so without
#: this a "no win" verdict could be XLA compared against itself.
engaged_traces = 0


def note_engaged() -> None:
    global engaged_traces
    engaged_traces += 1


def swin_group(batch: int, seq: int, width: int, heads: int,
               n_win: int | None):
    """Largest window group fitting VMEM; must divide the window-batch and
    (when a shift mask is present) the per-sample window count. The
    estimate includes the resident (heads, L, L) f32 bias and, when
    masked, the double-buffered (g, L, L) f32 mask block."""
    wbytes = 4 * width * width * 2
    bias_bytes = heads * seq * seq * 4
    for g in (128, 64, 32, 16, 8, 4, 2, 1):
        if batch % g:
            continue
        if n_win is not None and (n_win % g and g % n_win):
            continue
        blk = g * seq * width
        mask_bytes = 2 * g * seq * seq * 4 if n_win is not None else 0
        est = (
            wbytes
            + bias_bytes
            + mask_bytes
            + 2 * 2 * blk * 2          # x, out double-buffered bf16
            + 3 * blk * 2 + 3 * blk * 4  # qkv bf16 + f32
            + blk * 2                  # att scratch
            + g * seq * seq * (4 + 2)  # logits f32 + probs bf16
        )
        if est <= _VMEM_BUDGET:
            return g
    return None


def supports_fused_swin(batch: int, seq: int, width: int, heads: int,
                        n_win: int | None, dtype) -> bool:
    return (
        jnp.dtype(dtype) == jnp.bfloat16
        and width % heads == 0
        and seq % 8 == 0
        and width % 8 == 0
        and swin_group(batch, seq, width, heads, n_win) is not None
        and jax.default_backend() == "tpu"
    )


def _kernel(x_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref, bias_ref, mask_ref,
            o_ref, att_ref, *, heads: int, scale: float, has_mask: bool):
    x = x_ref[:]                               # (G, L, C) bf16
    g, l, c = x.shape
    hd = c // heads
    qkv = jax.lax.dot_general(
        x, wqkv_ref[:], dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    qkv = (qkv + bqkv_ref[0, :]).astype(x.dtype)
    for h in range(heads):
        q = qkv[:, :, h * hd:(h + 1) * hd]
        k = qkv[:, :, c + h * hd:c + (h + 1) * hd]
        v = qkv[:, :, 2 * c + h * hd:2 * c + (h + 1) * hd]
        logits = jax.lax.dot_general(
            q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale
        logits = logits + bias_ref[h]          # (L, L) broadcast over G
        if has_mask:
            logits = logits + mask_ref[:]      # (G, L, L) per-window mask
        m = jnp.max(logits, axis=2, keepdims=True)
        p = jnp.exp(logits - m)
        p = p / jnp.sum(p, axis=2, keepdims=True)
        att_ref[:, :, h * hd:(h + 1) * hd] = jax.lax.dot_general(
            p.astype(v.dtype), v,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(att_ref.dtype)
    out = jax.lax.dot_general(
        att_ref[:], wo_ref[:], dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[:] = (out + bo_ref[0, :]).astype(x.dtype)


@functools.partial(
    jax.jit, static_argnames=("heads", "interpret", "group")
)
def fused_window_attention(
    x: jax.Array,         # (N, L, C) bf16 window batch
    wqkv: jax.Array,      # (C, 3C) bf16
    bqkv: jax.Array,      # (3C,)
    wo: jax.Array,        # (C, C) bf16
    bo: jax.Array,        # (C,)
    bias: jax.Array,      # (heads, L, L) f32 relative-position bias
    mask: jax.Array | None,   # (n_win, L, L) f32 shift mask or None
    heads: int,
    interpret: bool = False,
    group: int | None = None,
) -> jax.Array:
    """Window-attention middle: out_proj(MHA(x) + bias [+ mask]) — the
    caller owns LN/partition/reverse/residual. Gate with
    supports_fused_swin() first."""
    n, l, c = x.shape
    n_win = mask.shape[0] if mask is not None else None
    group = group or swin_group(n, l, c, heads, n_win)
    assert group is not None, "gate with supports_fused_swin() first"
    xspec = pl.BlockSpec((group, l, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    has_mask = mask is not None
    if has_mask:
        if n_win % group == 0:
            period = n_win // group
            mspec = pl.BlockSpec((group, l, l),
                                 lambda i: (i % period, 0, 0),
                                 memory_space=pltpu.VMEM)
            mask_in = mask
        else:
            # group spans whole samples (n_win | group): tile the mask up
            reps = group // n_win
            mask_in = jnp.tile(mask, (reps, 1, 1))
            mspec = const((group, l, l))
    else:
        mask_in = jnp.zeros((1, 1, 1), jnp.float32)
        mspec = const((1, 1, 1))
    return pl.pallas_call(
        functools.partial(
            _kernel, heads=heads, scale=1.0 / np.sqrt(c // heads),
            has_mask=has_mask,
        ),
        grid=(n // group,),
        in_specs=[
            xspec,
            const((c, 3 * c)),
            const((1, 3 * c)),
            const((c, c)),
            const((1, c)),
            const(tuple(bias.shape)),
            mspec,
        ],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct((n, l, c), x.dtype),
        scratch_shapes=[pltpu.VMEM((group, l, c), x.dtype)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * l * (4 * c * c + 2 * l * c),
            bytes_accessed=2 * n * l * c * 2 + 4 * c * c * 2,
            transcendentals=n * heads * l * l,
        ),
    )(x, wqkv, bqkv.reshape(1, -1), wo, bo.reshape(1, -1),
      bias.astype(jnp.float32), mask_in)
