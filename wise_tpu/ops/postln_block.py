"""Post-LN (BERT-style) fused transformer-block kernels — the XLM-RoBERTa
text tower's residual blocks as single VMEM programs.

The reference's DEFAULT video/image extractor is
``xlm-roberta-large-ViT-H-14`` (reference extract-features.py:195-207),
whose text side is an open_clip HFTextEncoder: 24 post-LN BERT layers at
width 1024 / FF 4096 with per-example padding masks. The pre-LN kernels in
ops/block.py don't fit that structure, so these mirror their design (whole
residual block per grid step, weights resident via constant-index blocks,
f32 LN/softmax, bf16 GEMMs with f32 MXU accumulation) with two changes:

  fused_postln_attn_block: LN_attn(x + out_proj(MHA(x, key_mask)))
  fused_postln_mlp_block:  LN_out(x + proj(gelu(fc(x))))

* post-LN: no LayerNorm before the GEMMs — the block CLOSES with its LN,
  so each kernel emits the normalised residual sum.
* key masking is PER-EXAMPLE (padding positions from the token ids), not a
  static n_valid count: an additive f32 (B, 1, SP) mask rides in with the
  batch block. The unit dim is materialised host-side — Mosaic rejects the
  in-kernel 2D->3D shape cast (see ops.block.fused_attn_block_pooled_dyn).

Numerics note: the XLA path keeps f32 activations BETWEEN blocks (each
nn.LayerNorm(dtype=f32) emits f32; the next Dense rounds to bf16 on
entry). The kernels keep the residual sum and LN in f32 but emit bf16, so
inter-block traffic is halved and each block boundary rounds once — the
same rounding the XLA path applies one op later at the Dense input. The
residual add uses the f32 GEMM accumulation before any bf16 round.

Scope mirrors ops/block.py: inference, bf16 activations, head_dim 64,
VMEM-feasible tilings (``supports_fused_postln``); everything else stays
on the XLA path in models/clip/hf_text.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.custom_partitioning import custom_partitioning
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import NamedSharding, PartitionSpec as P

from .block import (
    _VMEM_BUDGET,
    _VMEM_LIMIT_BYTES,
    _gelu_f32,
    _ln_f32,
    _recompute_bwd,
)

# ---------------------------------------------------------------------------
# calibration tables — (seq_pad, width) -> group, measured on the v5e with
# scripts/calibrate_postln_block.py. The analytic fallbacks below are the
# same deliberately conservative formulas as ops/block.py (round-3 probes
# showed Mosaic's real allocation ~3x below them), so production shapes
# should come from these tables.
# ---------------------------------------------------------------------------

#: XLM-R-large text: (64, 1024). Hardware sweep (v5e, 100-iter chains,
#: scripts/calibrate_postln_block.py): attn g=4 wins at BOTH swept
#: batches (B=256: 4.35 ms vs 4.94 g=2 / 5.62 g=8 / 25.7 XLA einsum
#: layer; B=64: 4.05 ms) — the SP=64 blocks are small, but the per-head
#: (G, 64, 64) dots stop improving past g=4. MLP: split g=2 at the
#: B=256 ingest shape (3.18 ms vs 4.03 best single / 4.39 XLA; FF=4D
#: weights are 16.8 MB at width 1024, so single holds both resident
#: only via Mosaic's non-double-buffered real allocation).
_CALIBRATED_POSTLN_ATTN: dict = {(64, 1024): 4}
#: ("single"|"split", group) per (seq_pad, width)
_CALIBRATED_POSTLN_MLP: dict = {(64, 1024): ("split", 2)}


def _postln_attn_group(batch: int, seq_pad: int, width: int):
    cal = _CALIBRATED_POSTLN_ATTN.get((seq_pad, width))
    if cal is not None and batch % cal == 0:
        return cal
    wbytes = 4 * width * width * 2
    for g in (2, 8, 4, 1):
        if batch % g:
            continue
        blk = g * seq_pad * width
        est = (
            wbytes
            + 2 * 2 * blk * 2       # x, out double-buffered bf16
            + blk * 2               # att scratch
            + 3 * blk * 2           # qkv bf16
            + 3 * blk * 4           # qkv f32 pre-round + residual f32
            + g * seq_pad * seq_pad * (4 + 2)
        )
        if est <= _VMEM_BUDGET:
            return g
    return None


def _postln_mlp_choice(batch: int, seq_pad: int, width: int):
    cal = _CALIBRATED_POSTLN_MLP.get((seq_pad, width))
    if cal is not None and batch % cal[1] == 0:
        return cal
    # conservative analytic: single needs both (D, 4D) weights resident
    wsingle = 2 * 4 * width * width * 2
    for g in (2, 4, 1):
        if batch % g:
            continue
        blk = g * seq_pad * width
        if wsingle + 2 * 2 * blk * 2 + 5 * blk * 4 <= _VMEM_BUDGET:
            return ("single", g)
    wsplit = 4 * width * width * 2
    for g in (8, 4, 2, 1):
        if batch % g:
            continue
        blk = g * seq_pad * width
        if wsplit + 2 * 2 * blk * 2 + 2 * 4 * blk * 2 + blk * 4 \
                <= _VMEM_BUDGET:
            return ("split", g)
    return None


def supports_fused_postln(batch: int, seq_pad: int, width: int,
                          heads: int, dtype) -> bool:
    """Static admission gate for BOTH post-LN kernels (a layer is fused
    all-or-nothing — mixed layers would reintroduce the XLA<->Pallas
    boundary relayout tax, BENCHMARKS.md round-3 section)."""
    hd = width // heads if width % heads == 0 else 0
    return (
        hd == 64
        and jnp.dtype(dtype) == jnp.bfloat16
        and width % 128 == 0
        and seq_pad % 8 == 0
        and batch > 0
        and _postln_attn_group(batch, seq_pad, width) is not None
        and _postln_mlp_choice(batch, seq_pad, width) is not None
        and jax.default_backend() == "tpu"
    )


# ---------------------------------------------------------------------------
# attention block: LN(x + out_proj(MHA(x, key_mask)))
# ---------------------------------------------------------------------------


def _postln_attn_kernel(
    x_ref, km_ref, ln_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref,
    o_ref, att_ref, *, heads: int, scale: float,
):
    x = x_ref[:]                              # (G, SP, D) bf16
    g, sp, d = x.shape
    hd = d // heads
    qkv = jax.lax.dot_general(
        x, wqkv_ref[:], dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    qkv = (qkv + bqkv_ref[0, :]).astype(x.dtype)   # (G, SP, 3D)
    km = km_ref[:]                                 # (G, 1, SP) additive f32
    for h in range(heads):
        sl = slice(h * hd, (h + 1) * hd)
        q = qkv[:, :, h * hd:(h + 1) * hd]
        k = qkv[:, :, d + h * hd:d + (h + 1) * hd]
        v = qkv[:, :, 2 * d + h * hd:2 * d + (h + 1) * hd]
        logits = jax.lax.dot_general(
            q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale + km                             # (G, SP, SP)
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
    res = x.astype(jnp.float32) + out + bo_ref[0, :]
    o_ref[:] = _ln_f32(res, ln_ref[0, :], ln_ref[1, :]).astype(x.dtype)


@functools.partial(
    jax.jit, static_argnames=("heads", "interpret", "group")
)
def fused_postln_attn_block(
    x: jax.Array, km: jax.Array, ln_scale: jax.Array, ln_bias: jax.Array,
    wqkv: jax.Array, bqkv: jax.Array, wo: jax.Array, bo: jax.Array,
    heads: int, interpret: bool = False, group: int | None = None,
) -> jax.Array:
    """x (B, SP, D) bf16, km (B, 1, SP) additive f32 key mask (0 keep /
    -inf drop, from the padding mask) -> LN(x + out_proj(MHA(x))) as
    (B, SP, D) bf16. wqkv (D, 3D) packs the separate q/k/v projections."""
    b, sp, d = x.shape
    group = group or _postln_attn_group(b, sp, d)
    assert group is not None, "gate with supports_fused_postln() first"
    xspec = pl.BlockSpec((group, sp, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    mspec = pl.BlockSpec((group, 1, sp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    ln = jnp.stack([ln_scale, ln_bias]).astype(jnp.float32)
    return pl.pallas_call(
        functools.partial(
            _postln_attn_kernel, heads=heads,
            scale=1.0 / np.sqrt(d // heads),
        ),
        grid=(b // group,),
        in_specs=[
            xspec,
            mspec,
            const((2, d)),
            const((d, 3 * d)),
            const((1, 3 * d)),
            const((d, d)),
            const((1, d)),
        ],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct((b, sp, d), x.dtype),
        scratch_shapes=[pltpu.VMEM((group, sp, d), x.dtype)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT_BYTES,
        ),
        cost_estimate=pl.CostEstimate(
            flops=8 * b * sp * d * d + 4 * b * sp * sp * d,
            bytes_accessed=2 * b * sp * d * 2 + 4 * d * d * 2,
            transcendentals=b * heads * sp * sp,
        ),
    )(x, km, ln, wqkv, bqkv.reshape(1, -1), wo, bo.reshape(1, -1))


# ---------------------------------------------------------------------------
# MLP block: LN(x + proj(gelu(fc(x))))
# ---------------------------------------------------------------------------


def _postln_mlp_kernel(
    x_ref, ln_ref, wfc_ref, bfc_ref, wproj_ref, bproj_ref, o_ref,
    *, act: str,
):
    x = x_ref[:]                              # (G, SP, D) bf16
    h = jax.lax.dot_general(
        x, wfc_ref[:], dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    h = _gelu_f32(h + bfc_ref[0, :], act).astype(x.dtype)
    out = jax.lax.dot_general(
        h, wproj_ref[:], dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    res = x.astype(jnp.float32) + out + bproj_ref[0, :]
    o_ref[:] = _ln_f32(res, ln_ref[0, :], ln_ref[1, :]).astype(x.dtype)


def _postln_fc_kernel(x_ref, wfc_ref, bfc_ref, h_ref, *, act: str):
    h = jax.lax.dot_general(
        x_ref[:], wfc_ref[:], dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    h_ref[:] = _gelu_f32(h + bfc_ref[0, :], act).astype(h_ref.dtype)


def _postln_proj_kernel(x_ref, h_ref, ln_ref, wproj_ref, bproj_ref, o_ref):
    out = jax.lax.dot_general(
        h_ref[:], wproj_ref[:], dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    res = x_ref[:].astype(jnp.float32) + out + bproj_ref[0, :]
    o_ref[:] = _ln_f32(res, ln_ref[0, :], ln_ref[1, :]).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("act", "interpret", "group", "variant")
)
def fused_postln_mlp_block(
    x: jax.Array, ln_scale: jax.Array, ln_bias: jax.Array,
    wfc: jax.Array, bfc: jax.Array, wproj: jax.Array, bproj: jax.Array,
    act: str = "gelu", interpret: bool = False,
    group: int | None = None, variant: str | None = None,
) -> jax.Array:
    """x (B, SP, D) bf16 -> LN(x + proj(gelu(fc(x)))) (B, SP, D) bf16.
    ``variant`` "single" fuses the whole block in one program (both FF
    weights resident); "split" runs an fc+gelu kernel then a
    proj+residual+LN kernel (one FF weight resident each). Default from
    the calibration table."""
    b, sp, d = x.shape
    ff = wfc.shape[1]
    if group is None or variant is None:
        choice = _postln_mlp_choice(b, sp, d)
        assert choice is not None, "gate with supports_fused_postln() first"
        variant = variant or choice[0]
        group = group or choice[1]
    xspec = pl.BlockSpec((group, sp, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    ln = jnp.stack([ln_scale, ln_bias]).astype(jnp.float32)
    params = pltpu.CompilerParams(
        dimension_semantics=("arbitrary",),
        vmem_limit_bytes=_VMEM_LIMIT_BYTES,
    )
    if variant == "single":
        return pl.pallas_call(
            functools.partial(_postln_mlp_kernel, act=act),
            grid=(b // group,),
            in_specs=[
                xspec,
                const((2, d)),
                const((d, ff)),
                const((1, ff)),
                const((ff, d)),
                const((1, d)),
            ],
            out_specs=xspec,
            out_shape=jax.ShapeDtypeStruct((b, sp, d), x.dtype),
            interpret=interpret,
            compiler_params=params,
            cost_estimate=pl.CostEstimate(
                flops=4 * b * sp * d * ff,
                bytes_accessed=2 * b * sp * d * 2 + 2 * d * ff * 2,
                transcendentals=b * sp * ff,
            ),
        )(x, ln, wfc, bfc.reshape(1, -1), wproj, bproj.reshape(1, -1))
    hspec = pl.BlockSpec((group, sp, ff), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    h = pl.pallas_call(
        functools.partial(_postln_fc_kernel, act=act),
        grid=(b // group,),
        in_specs=[xspec, const((d, ff)), const((1, ff))],
        out_specs=hspec,
        out_shape=jax.ShapeDtypeStruct((b, sp, ff), x.dtype),
        interpret=interpret,
        compiler_params=params,
    )(x, wfc, bfc.reshape(1, -1))
    return pl.pallas_call(
        _postln_proj_kernel,
        grid=(b // group,),
        in_specs=[xspec, hspec, const((2, d)), const((ff, d)),
                  const((1, d))],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct((b, sp, d), x.dtype),
        interpret=interpret,
        compiler_params=params,
    )(x, h, ln, wproj, bproj.reshape(1, -1))


# ---------------------------------------------------------------------------
# GSPMD rules: batch-parallel, weights replicated, mask sharded with x —
# same shape of rule as ops/block.py's.
# ---------------------------------------------------------------------------


def _x_batch_only(sharding):
    spec = getattr(sharding, "spec", None)
    batch = spec[0] if spec is not None and len(spec) > 0 else None
    return NamedSharding(sharding.mesh, P(batch, None, None))


def _replicated_like(mesh, shape):
    return NamedSharding(mesh, P(*(None for _ in shape.shape)))


def _postln_infer(*args):
    arg_shapes = args[-2]
    return _x_batch_only(arg_shapes[0].sharding)


@functools.partial(custom_partitioning, static_argnums=(8,))
def fused_postln_attn_block_spmd(x, km, ln_s, ln_b, wqkv, bqkv, wo, bo,
                                 heads):
    return fused_postln_attn_block(x, km, ln_s, ln_b, wqkv, bqkv, wo, bo,
                                   heads=heads)


def _postln_attn_partition(*args):
    statics = args[:-3]
    mesh, arg_shapes, _result_shape = args[-3:]
    xsh = _x_batch_only(arg_shapes[0].sharding)
    arg_shardings = (xsh, xsh) + tuple(
        _replicated_like(mesh, a) for a in arg_shapes[2:]
    )

    def lower_fn(x, km, *weights):
        return fused_postln_attn_block(x, km, *weights, heads=statics[0])

    return mesh, lower_fn, xsh, arg_shardings


fused_postln_attn_block_spmd.def_partition(
    infer_sharding_from_operands=_postln_infer,
    partition=_postln_attn_partition,
    sharding_rule="b s d, b u s, e, f, g h, i, j k, l -> b s d",
)


@functools.partial(custom_partitioning, static_argnums=(7,))
def fused_postln_mlp_block_spmd(x, ln_s, ln_b, wfc, bfc, wproj, bproj,
                                act):
    return fused_postln_mlp_block(x, ln_s, ln_b, wfc, bfc, wproj, bproj,
                                  act=act)


def _postln_mlp_partition(*args):
    statics = args[:-3]
    mesh, arg_shapes, _result_shape = args[-3:]
    xsh = _x_batch_only(arg_shapes[0].sharding)
    arg_shardings = (xsh,) + tuple(
        _replicated_like(mesh, a) for a in arg_shapes[1:]
    )

    def lower_fn(x, *weights):
        return fused_postln_mlp_block(x, *weights, act=statics[0])

    return mesh, lower_fn, xsh, arg_shardings


fused_postln_mlp_block_spmd.def_partition(
    infer_sharding_from_operands=_postln_infer,
    partition=_postln_mlp_partition,
    sharding_rule="b s d, e, f, g h, i, j k, l -> b s d",
)


# ---------------------------------------------------------------------------
# trainable wrappers — same design as ops/block.py's: Pallas forward
# (through the custom_partitioning wrapper), plain-ops recompute backward
# via jax.vjp. custom_partitioning has no autodiff rule, so without these
# a fine-tune step through a fused XLM-R text tower fails to trace.
# ---------------------------------------------------------------------------


def plain_postln_attn_block(x, km, ln_s, ln_b, wqkv, bqkv, wo, bo, *,
                            heads: int):
    """Plain-ops reference of fused_postln_attn_block:
    LN(x + out_proj(MHA(x, km)))."""
    b, sp, d = x.shape
    hd = d // heads
    qkv = (x @ wqkv + bqkv).astype(x.dtype)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    qh = q.reshape(b, sp, heads, hd)
    kh = k.reshape(b, sp, heads, hd)
    vh = v.reshape(b, sp, heads, hd)
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", qh.astype(jnp.float32), kh.astype(jnp.float32)
    ) * np.float32(1.0 / np.sqrt(hd)) + km[:, :, None, :]
    p = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    att = jnp.einsum("bhqk,bkhd->bqhd", p, vh).reshape(b, sp, d)
    res = x.astype(jnp.float32) + (att @ wo).astype(jnp.float32) \
        + bo.astype(jnp.float32)
    return _ln_f32(res, ln_s, ln_b).astype(x.dtype)


def plain_postln_mlp_block(x, ln_s, ln_b, wfc, bfc, wproj, bproj, *,
                           act: str):
    """Plain-ops reference of fused_postln_mlp_block:
    LN(x + proj(gelu(fc(x))))."""
    h = (x @ wfc).astype(jnp.float32) + bfc.astype(jnp.float32)
    h = _gelu_f32(h, act).astype(x.dtype)
    res = x.astype(jnp.float32) + (h @ wproj).astype(jnp.float32) \
        + bproj.astype(jnp.float32)
    return _ln_f32(res, ln_s, ln_b).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8,))
def fused_postln_attn_block_train(x, km, ln_s, ln_b, wqkv, bqkv, wo, bo,
                                  heads):
    return fused_postln_attn_block_spmd(x, km, ln_s, ln_b, wqkv, bqkv,
                                        wo, bo, heads)


fused_postln_attn_block_train.defvjp(
    lambda x, km, ln_s, ln_b, wqkv, bqkv, wo, bo, heads: (
        fused_postln_attn_block_spmd(x, km, ln_s, ln_b, wqkv, bqkv, wo,
                                     bo, heads),
        (x, km, ln_s, ln_b, wqkv, bqkv, wo, bo),
    ),
    _recompute_bwd(
        lambda heads, *ts: plain_postln_attn_block(*ts, heads=heads)
    ),
)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def fused_postln_mlp_block_train(x, ln_s, ln_b, wfc, bfc, wproj, bproj,
                                 act):
    return fused_postln_mlp_block_spmd(x, ln_s, ln_b, wfc, bfc, wproj,
                                       bproj, act)


fused_postln_mlp_block_train.defvjp(
    lambda x, ln_s, ln_b, wfc, bfc, wproj, bproj, act: (
        fused_postln_mlp_block_spmd(x, ln_s, ln_b, wfc, bfc, wproj,
                                    bproj, act),
        (x, ln_s, ln_b, wfc, bfc, wproj, bproj),
    ),
    _recompute_bwd(
        lambda act, *ts: plain_postln_mlp_block(*ts, act=act)
    ),
)
