"""Fused whole-Swin-block kernel (Pallas TPU) — CLAP's HTSAT layers.

Motivation (BENCHMARKS.md CLAP roofline, round 3): with the fused window
ATTENTION kernel in place (ops/swin_attention.py) the HTSAT tower still
runs at ~12% MFU against its GEMM floor, dominated by stage 0/1 — small
GEMMs (C=96..192 is under the 128-lane width), per-block LayerNorm/MLP/
residual HBM passes, and the kernel<->XLA boundary relayouts that the
ViT whole-block kernels (ops/block.py) identified as the dominant tax.
This kernel runs the ENTIRE Swin residual block in one VMEM program per
window group:

    o   = x + proj(WindowMHA(LN1(x), rel-pos bias [, shift mask]))
    out = o + fc2(gelu(fc1(LN2(o))))

on window-layout activations (N = B*nH*nW windows, L = window^2 tokens,
C channels). The caller (models/clap/model.py SwinBlock) owns the pure
layout ops — reshape / roll / window partition / reverse — which are the
only parts of a Swin block that need the spatial view; LN, attention,
MLP, and the residual adds are permutation-equivariant, so computing
them in window layout is exact.

HTSAT VMEM feasibility: all four stage widths keep the whole weight set
(qkv + proj + fc1 + fc2 = 12 C^2 elements) comfortably resident —
C=96: 0.2 MB, 192: 0.9 MB, 384: 3.5 MB, 768: 14.2 MB bf16; the analytic
group picker admits stages 0-2 directly and stage 3 at small groups
(the conservative formula is ~3x above Mosaic's real allocation — see
ops/block.py round-3 calibration notes). head_dim is 24 everywhere;
the attention kernel already measured that Mosaic handles the unaligned
per-head lane slices fine (ops/swin_attention.py header).

Shift-mask plumbing matches ops/swin_attention.py: the additive
(n_win, L, L) mask varies within a window batch with period n_win, so it
rides as a grid-blocked input when n_win % group == 0, else tiled up.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .block import _gelu_f32, _ln_f32

_VMEM_BUDGET = 11_500_000
_VMEM_LIMIT_BYTES = 100 * 1024 * 1024

#: (seq, width) -> group measured fastest on hardware
#: (scripts/calibrate_swin_block.py --flat --groups 64 32 16 8, v5e,
#: batch 32, 50-iter chains; one group serves both the shifted and
#: unshifted block of a stage, so the winner minimises the PAIR):
#:   C=96  (n=2048, n_win=64): 32flat 1.555+1.612 ms (analytic-16 pair
#:          1.701+1.674; 64flat 1.718+1.570)
#:   C=192 (n=512, n_win=16):  32flat 0.657+0.643 (analytic-8 non-flat
#:          was the round-3 default)
#:   C=384 (n=128, n_win=4):   32flat 0.645+0.304
#:   C=768 (n=32, single window, no shifted block after the torch clamp):
#:          16flat 0.269 — the analytic formula REJECTS this stage
#:          (weights alone est. 14.2 MB > budget) but Mosaic compiles and
#:          runs it ~2.4x faster than the 0.65 ms XLA stage, the same ~3x
#:          formula-vs-reality gap ops/block.py measured.
#: Analytic fallback below for unprobed shapes/batches.
_CALIBRATED_SWIN_BLOCK: dict = {
    (64, 96): 32, (64, 192): 32, (64, 384): 32, (64, 768): 16,
}

#: (seq, width) -> group at which the FLAT variant (merged (G*L, C) rows
#: for the position-wise GEMMs) beat the batched 3-D GEMMs on hardware.
#: When a shape's entry equals the group in use, production runs flat.
#: Flat won at EVERY HTSAT stage (narrow C under the 128-lane MXU width —
#: the merged rows keep the systolic array streaming).
_CALIBRATED_FLAT_SWIN: dict = {
    (64, 96): 32, (64, 192): 32, (64, 384): 32, (64, 768): 16,
}

#: Trace-time engagement counter (see ops/swin_attention.py engaged_traces)
#: so A/B harnesses can assert the kernel really traced.
engaged_traces = 0


def note_engaged() -> None:
    global engaged_traces
    engaged_traces += 1


def swin_block_group(batch: int, seq: int, width: int, heads: int,
                     n_win: int | None, ff: int):
    """Largest window group fitting VMEM; must divide the window batch and
    be compatible with the mask period (n_win | g or g | n_win)."""
    cal = _CALIBRATED_SWIN_BLOCK.get((seq, width))
    if (cal is not None and batch % cal == 0
            and (n_win is None or n_win % cal == 0 or cal % n_win == 0)):
        return cal
    wbytes = (4 * width * width + 2 * width * ff) * 2
    bias_bytes = heads * seq * seq * 4
    for g in (64, 32, 16, 8, 4, 2, 1):
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
            + 2 * 2 * blk * 2            # x, out double-buffered bf16
            + 3 * blk * (2 + 4)          # qkv bf16 + f32 pre-round
            + blk * 2                    # att scratch
            + g * seq * seq * (4 + 2)    # logits f32 + probs bf16
            + g * seq * ff * (2 + 4)     # MLP intermediate bf16 + f32
            + blk * 4                    # LN f32 temp
        )
        if est <= _VMEM_BUDGET:
            return g
    return None


def supports_fused_swin_block(batch: int, seq: int, width: int, heads: int,
                              n_win: int | None, ff: int, dtype) -> bool:
    return (
        jnp.dtype(dtype) == jnp.bfloat16
        and width % heads == 0
        and seq % 8 == 0
        and width % 8 == 0
        and ff % 8 == 0
        and swin_block_group(batch, seq, width, heads, n_win, ff) is not None
        and jax.default_backend() == "tpu"
    )


def _kernel(x_ref, ln1_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref, bias_ref,
            mask_ref, ln2_ref, wfc_ref, bfc_ref, wproj_ref, bproj_ref,
            o_ref, att_ref, *, heads: int, scale: float, act: str,
            has_mask: bool, flat: bool):
    x = x_ref[:]                               # (G, L, C) bf16
    g, l, c = x.shape
    hd = c // heads
    y = _ln_f32(
        x.astype(jnp.float32), ln1_ref[0, :], ln1_ref[1, :]
    ).astype(x.dtype)
    if flat:
        # Merged (G*L, C) rows for every position-wise GEMM (qkv, out-proj,
        # fc1, fc2): HTSAT's narrow stages (C=96..384 under the 128-lane
        # MXU width) waste most of each batched (L=64, C) GEMM; one big
        # 2-D GEMM keeps the systolic array streaming (same trick as
        # ops/block.py flat variants). Attention stays per-window.
        qkv = jax.lax.dot_general(
            y.reshape(g * l, c), wqkv_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(g, l, 3 * c)
    else:
        qkv = jax.lax.dot_general(
            y, wqkv_ref[:], dimension_numbers=(((2,), (0,)), ((), ())),
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
            logits = logits + mask_ref[:]      # (G, L, L) per-window
        m = jnp.max(logits, axis=2, keepdims=True)
        p = jnp.exp(logits - m)
        p = p / jnp.sum(p, axis=2, keepdims=True)
        att_ref[:, :, h * hd:(h + 1) * hd] = jax.lax.dot_general(
            p.astype(v.dtype), v,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(att_ref.dtype)
    if flat:
        out = jax.lax.dot_general(
            att_ref[:].reshape(g * l, c), wo_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o = x.reshape(g * l, c) + (out + bo_ref[0, :]).astype(x.dtype)
        y2 = _ln_f32(
            o.astype(jnp.float32), ln2_ref[0, :], ln2_ref[1, :]
        ).astype(x.dtype)
        h2 = jax.lax.dot_general(
            y2, wfc_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        h2 = _gelu_f32(h2 + bfc_ref[0, :], act).astype(x.dtype)
        mlp = jax.lax.dot_general(
            h2, wproj_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[:] = (o + (mlp + bproj_ref[0, :]).astype(x.dtype)).reshape(
            g, l, c
        )
        return
    out = jax.lax.dot_general(
        att_ref[:], wo_ref[:], dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o = x + (out + bo_ref[0, :]).astype(x.dtype)   # first residual
    y2 = _ln_f32(
        o.astype(jnp.float32), ln2_ref[0, :], ln2_ref[1, :]
    ).astype(x.dtype)
    h2 = jax.lax.dot_general(
        y2, wfc_ref[:], dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    h2 = _gelu_f32(h2 + bfc_ref[0, :], act).astype(x.dtype)
    mlp = jax.lax.dot_general(
        h2, wproj_ref[:], dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[:] = o + (mlp + bproj_ref[0, :]).astype(x.dtype)


@functools.partial(
    jax.jit, static_argnames=("heads", "act", "interpret", "group", "flat")
)
def fused_swin_block(
    x: jax.Array,          # (N, L, C) bf16 window batch (raw, pre-LN)
    ln1_scale: jax.Array, ln1_bias: jax.Array,
    wqkv: jax.Array,       # (C, 3C) bf16
    bqkv: jax.Array,       # (3C,)
    wo: jax.Array,         # (C, C) bf16
    bo: jax.Array,         # (C,)
    bias: jax.Array,       # (heads, L, L) f32 relative-position bias
    mask: jax.Array | None,    # (n_win, L, L) f32 shift mask or None
    ln2_scale: jax.Array, ln2_bias: jax.Array,
    wfc: jax.Array,        # (C, FF) bf16
    bfc: jax.Array,        # (FF,)
    wproj: jax.Array,      # (FF, C) bf16
    bproj: jax.Array,      # (C,)
    heads: int,
    act: str = "gelu",
    interpret: bool = False,
    group: int | None = None,
    flat: bool | None = None,
) -> jax.Array:
    """Whole Swin residual block on window-layout activations:
    out = o + MLP(LN2(o)) where o = x + proj(MHA(LN1(x), bias [, mask])).
    The caller owns reshape/roll/partition/reverse. Gate with
    supports_fused_swin_block() first."""
    n, l, c = x.shape
    ff = wfc.shape[1]
    n_win = mask.shape[0] if mask is not None else None
    group = group or swin_block_group(n, l, c, heads, n_win, ff)
    assert group is not None, "gate with supports_fused_swin_block() first"
    if flat is None:
        flat = _CALIBRATED_FLAT_SWIN.get((l, c)) == group
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
            reps = group // n_win
            mask_in = jnp.tile(mask, (reps, 1, 1))
            mspec = const((group, l, l))
    else:
        mask_in = jnp.zeros((1, 1, 1), jnp.float32)
        mspec = const((1, 1, 1))
    ln1 = jnp.stack([ln1_scale, ln1_bias]).astype(jnp.float32)
    ln2 = jnp.stack([ln2_scale, ln2_bias]).astype(jnp.float32)
    return pl.pallas_call(
        functools.partial(
            _kernel, heads=heads, scale=1.0 / np.sqrt(c // heads),
            act=act, has_mask=has_mask, flat=flat,
        ),
        grid=(n // group,),
        in_specs=[
            xspec,
            const((2, c)),
            const((c, 3 * c)),
            const((1, 3 * c)),
            const((c, c)),
            const((1, c)),
            const(tuple(bias.shape)),
            mspec,
            const((2, c)),
            const((c, ff)),
            const((1, ff)),
            const((ff, c)),
            const((1, c)),
        ],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct((n, l, c), x.dtype),
        scratch_shapes=[pltpu.VMEM((group, l, c), x.dtype)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT_BYTES,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * l * (4 * c * c + 2 * l * c + 2 * c * ff),
            bytes_accessed=2 * n * l * c * 2 + (4 * c * c + 2 * c * ff) * 2,
            transcendentals=n * (heads * l * l + l * ff),
        ),
    )(x, ln1, wqkv, bqkv.reshape(1, -1), wo, bo.reshape(1, -1),
      bias.astype(jnp.float32), mask_in, ln2,
      wfc, bfc.reshape(1, -1), wproj, bproj.reshape(1, -1))
