"""Fused patch-embed + first attention block (the "embed fold").

The ViT entry sequence — patch-embed GEMM, cls/positional add, ``ln_pre``,
token-axis pad — runs in XLA and hands a (B, SP, D) stream to the first
whole-block Pallas kernel (ops/block.py). That handoff costs the same
boundary-layout tax the all-kernel layers were built to avoid (~1.1 ms per
Pallas<->XLA transition at ViT-B/32 step shapes, BENCHMARKS.md round 3),
plus two full HBM passes over the stream for the positional add and the
f32 ``ln_pre``.

This module fuses the whole entry into ONE kernel: each grid step loads a
(G, SP, p*p*3) block of zero-padded patchified pixels, runs the patch
GEMM against the resident (p*p*3, D) kernel, adds a combined
positional+cls row table, applies ``ln_pre`` and then the standard
attention block (LN1 -> qkv -> masked softmax -> out-proj -> residual) —
so the first activation that ever touches HBM in stream layout is the
first layer's OUTPUT, already in Pallas-native layout.

Semantics/contract match ops/block.py's attention kernel: key columns
>= n_valid are masked, padded query rows carry garbage the caller never
reads. Row 0 of the input block must be ZEROS (the cls token enters via
the combined table: ``posc[0] = positional[0] + class_embedding``), as
must rows >= n_valid. The patch GEMM accumulates f32 and the positional
add happens in f32 — one rounding step FEWER than the XLA path (which
rounds the conv output to bf16 before the add); deltas are the usual
bf16-rounding class (model-level cos vs the XLA path ~0.9999).

Reference parity: the entry sequence mirrors open_clip's
VisionTransformer.forward (conv1 -> cls concat -> pos add -> ln_pre);
see reference src/feature/mlfoundation_openclip.py for the consumer.

MEASURED NEGATIVE — NOT WIRED INTO THE MODEL. The round-4 hardware probe
(scripts/probe_embed_fold.py, B=512 ViT-B/32 geometry) put the fold at
2.62-3.03 ms vs 1.92 ms for the split entry (XLA embed + boundary + attn
kernel): the in-kernel patch GEMM runs at roughly half XLA's efficiency
on the (56, 3072) x (3072, 768) shape, and the HLO audit
(scripts/audit_hlo.py) showed the entry boundary costs only ~0.13 ms of
relayout (a 38.5 MB copy) — not the ~1.1 ms/layer class the inter-layer
boundaries paid — so there is no tax for the fold to recover. Kept as a
correct, tested reference kernel (parity: tests/test_embed_block.py)
for shapes where the trade may flip (larger patches shrink PD); the
calibration table gates it OFF (empty) and nothing sets it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.custom_partitioning import custom_partitioning
from jax.experimental.pallas import tpu as pltpu

from .block import (
    _CALIBRATED_ATTN,
    _VMEM_LIMIT_BYTES,
    _ln_f32,
    _replicated_like,
    _x_batch_only,
)

#: (seq_pad, width) -> group, measured on hardware (scripts/
#: probe_embed_fold.py). Populated only for shapes where the fold BEAT the
#: split entry end-to-end; absence means the fold is off for that shape.
_CALIBRATED_EMBED: dict = {}


def supports_embed_fold(batch: int, seq_pad: int, width: int, heads: int,
                        dtype) -> bool:
    """Gate: the fold replaces the MONOLITHIC head_dim-64 attention block
    (the padded-head five-kernel path keeps the plain entry), on shapes
    with a hardware-calibrated group."""
    if jnp.dtype(dtype) != jnp.bfloat16:
        return False
    if width % heads or width // heads != 64:
        return False
    g = _CALIBRATED_EMBED.get((seq_pad, width))
    return g is not None and batch % g == 0 and (
        (seq_pad, width) in _CALIBRATED_ATTN
    )


def _embed_attn_kernel(
    xp_ref, kern_ref, posc_ref, lnp_ref, ln_ref, wqkv_ref, bqkv_ref,
    wo_ref, bo_ref, o_ref, att_ref, *, heads: int, n_valid: int,
    scale: float,
):
    xp = xp_ref[:]                              # (G, SP, PD) bf16
    g, sp, pd = xp.shape
    d = kern_ref.shape[1]
    hd = d // heads
    # patch embed: f32 accumulation, positional+cls table added in f32
    t = jax.lax.dot_general(
        xp, kern_ref[:], dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    t = t + posc_ref[:]                         # (SP, D) f32, broadcast
    t = _ln_f32(t, lnp_ref[0, :], lnp_ref[1, :])
    x = t.astype(o_ref.dtype)                   # residual stream
    # --- standard attention block (mirrors block._attn_block_kernel)
    y = _ln_f32(
        x.astype(jnp.float32), ln_ref[0, :], ln_ref[1, :]
    ).astype(wqkv_ref.dtype)
    qkv = jax.lax.dot_general(
        y, wqkv_ref[:], dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    qkv = (qkv + bqkv_ref[0, :]).astype(y.dtype)   # (G, SP, 3D)
    col = jax.lax.broadcasted_iota(jnp.int32, (g, sp, sp), 2)
    keep = col < n_valid
    for h in range(heads):
        sl = slice(h * hd, (h + 1) * hd)
        q = qkv[:, :, h * hd:(h + 1) * hd]
        k = qkv[:, :, d + h * hd:d + (h + 1) * hd]
        v = qkv[:, :, 2 * d + h * hd:2 * d + (h + 1) * hd]
        logits = jax.lax.dot_general(
            q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        logits = jnp.where(keep, logits * scale, -jnp.inf)
        m = jnp.max(logits, axis=2, keepdims=True)
        p = jnp.exp(logits - m)
        p = p / jnp.sum(p, axis=2, keepdims=True)
        att_ref[:, :, sl] = jax.lax.dot_general(
            p.astype(v.dtype), v,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(att_ref.dtype)
    out = jax.lax.dot_general(
        att_ref[:], wo_ref[:], dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[:] = x + (out + bo_ref[0, :]).astype(x.dtype)


def fused_embed_attn_block(
    xp: jax.Array, kern: jax.Array, posc: jax.Array,
    lnp_s: jax.Array, lnp_b: jax.Array, ln_s: jax.Array, ln_b: jax.Array,
    wqkv: jax.Array, bqkv: jax.Array, wo: jax.Array, bo: jax.Array,
    heads: int, n_valid: int, bf16_out: bool = False,
    interpret: bool = False, group: int | None = None,
) -> jax.Array:
    """xp (B, SP, p*p*3) bf16 zero-padded patch pixels (row 0 and rows
    >= n_valid zero) -> first-layer attention output (B, SP, D) in the
    residual-stream dtype (f32 unless ``bf16_out``). ``kern`` is the
    conv1 kernel reshaped (p*p*3, D); ``posc`` the combined (SP, D) f32
    positional table (row 0 includes the class embedding, pad rows 0)."""
    b, sp, pd = xp.shape
    d = kern.shape[1]
    group = group or _CALIBRATED_EMBED.get((sp, d))
    assert group is not None, "gate with supports_embed_fold() first"
    out_dtype = jnp.bfloat16 if bf16_out else jnp.float32
    xspec = pl.BlockSpec((group, sp, pd), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((group, sp, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    lnp = jnp.stack([lnp_s, lnp_b]).astype(jnp.float32)
    ln = jnp.stack([ln_s, ln_b]).astype(jnp.float32)
    return pl.pallas_call(
        functools.partial(
            _embed_attn_kernel, heads=heads, n_valid=n_valid,
            scale=1.0 / np.sqrt(d // heads),
        ),
        grid=(b // group,),
        in_specs=[
            xspec,
            const((pd, d)),
            const((sp, d)),
            const((2, d)),
            const((2, d)),
            const((d, 3 * d)),
            const((1, 3 * d)),
            const((d, d)),
            const((1, d)),
        ],
        out_specs=ospec,
        out_shape=jax.ShapeDtypeStruct((b, sp, d), out_dtype),
        scratch_shapes=[pltpu.VMEM((group, sp, d), out_dtype)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT_BYTES,
        ),
    )(xp, kern, posc.astype(jnp.float32), lnp, ln,
      wqkv, bqkv.reshape(1, -1), wo, bo.reshape(1, -1))


def plain_embed_attn(xp, kern, posc, lnp_s, lnp_b, ln_s, ln_b,
                     wqkv, bqkv, wo, bo, heads: int, n_valid: int,
                     bf16_out: bool = False):
    """Plain-ops mirror of the kernel's numerics (f32-accumulated patch
    GEMM, f32 positional add) for parity tests. Padded rows differ from
    the kernel only where the contract says garbage is allowed."""
    b, sp, pd = xp.shape
    d = kern.shape[1]
    hd = d // heads
    t = jnp.einsum(
        "bsp,pd->bsd", xp, kern, preferred_element_type=jnp.float32
    ) + posc.astype(jnp.float32)
    t = _ln_f32(t, lnp_s.astype(jnp.float32), lnp_b.astype(jnp.float32))
    x = t.astype(jnp.bfloat16 if bf16_out else jnp.float32)
    y = _ln_f32(
        x.astype(jnp.float32), ln_s.astype(jnp.float32),
        ln_b.astype(jnp.float32),
    ).astype(wqkv.dtype)
    qkv = (jnp.einsum(
        "bsd,de->bse", y, wqkv, preferred_element_type=jnp.float32
    ) + bqkv).astype(y.dtype)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    qh = q.reshape(b, sp, heads, hd)
    kh = k.reshape(b, sp, heads, hd)
    vh = v.reshape(b, sp, heads, hd)
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", qh.astype(jnp.float32), kh.astype(jnp.float32)
    ) * np.float32(1.0 / np.sqrt(hd))
    col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, sp), 3)
    logits = jnp.where(col < n_valid, logits, -jnp.inf)
    p = jax.nn.softmax(logits, axis=-1).astype(qkv.dtype)
    att = jnp.einsum(
        "bhqk,bkhd->bqhd", p, vh, preferred_element_type=jnp.float32
    ).astype(qkv.dtype).reshape(b, sp, d)
    out = jnp.einsum(
        "bsd,de->bse", att, wo, preferred_element_type=jnp.float32
    ) + bo
    return x + out.astype(x.dtype)


@functools.partial(custom_partitioning, static_argnums=(11, 12, 13))
def fused_embed_attn_block_spmd(xp, kern, posc, lnp_s, lnp_b, ln_s, ln_b,
                                wqkv, bqkv, wo, bo, heads, n_valid,
                                bf16_out):
    return fused_embed_attn_block(
        xp, kern, posc, lnp_s, lnp_b, ln_s, ln_b, wqkv, bqkv, wo, bo,
        heads=heads, n_valid=n_valid, bf16_out=bf16_out,
    )


def _embed_infer(*args):
    arg_shapes = args[-2]
    return _x_batch_only(arg_shapes[0].sharding)


def _embed_partition(*args):
    statics = args[:-3]
    mesh, arg_shapes, _result = args[-3:]
    xsh = _x_batch_only(arg_shapes[0].sharding)
    arg_shardings = (xsh,) + tuple(
        _replicated_like(mesh, a) for a in arg_shapes[1:]
    )

    def lower_fn(xp, *weights):
        heads, n_valid, bf16_out = statics
        return fused_embed_attn_block(
            xp, *weights, heads=heads, n_valid=n_valid, bf16_out=bf16_out,
        )

    return mesh, lower_fn, xsh, arg_shardings


fused_embed_attn_block_spmd.def_partition(
    infer_sharding_from_operands=_embed_infer,
    partition=_embed_partition,
    sharding_rule=(
        "b s p, p d, s d, e, f, g, h, i j, k, l m, n -> b s d"
    ),
)
