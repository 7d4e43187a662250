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

The same design also wins at medium sequences: at ViT-L/14 shapes
(batch 256, 264 tokens, 16 heads of 64) the XLA middle materialises
~571 MB of logits per layer and costs 6.44 ms; the kernel (group 2) runs
it in 2.09 ms (3.1x).

Scope: inference path — requires head_dim 64, a VMEM-feasible
(group, seq, width) tiling (``_pick_group``), bf16 compute. Everything
else (f32 parity mode, other head dims, training backward) uses the
standard XLA path (``xla_attention``). The vision tower pads its token
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
from jax.experimental.custom_partitioning import custom_partitioning
from jax.experimental.pallas import tpu as pltpu

# VMEM budget for one grid step's working set (of ~16 MB/core): q/k/v/o
# blocks (double-buffered) + f32 logits + bf16 probs for one head. 12 MB
# is validated on hardware up to (1, 584, 1024) — the SigLIP-384 tower
# (estimate 11.6 MB compiles and runs 3.3x faster than the XLA middle).
_VMEM_BUDGET = 12_000_000


def _pick_group(batch: int, seq_pad: int, width: int):
    """Largest batches-per-step whose working set fits the VMEM budget.

    Working sets near the ceiling only pay off at group 1: ViT-H/14 at
    group 2 (est 11.7 MB) measured 38% SLOWER than XLA end-to-end while
    group 1 (5.8 MB) was 2.1x faster standalone — so groups > 1 must stay
    under 10 MB and only group 1 may use the full validated 12 MB."""
    for g in (8, 4, 2, 1):
        if batch % g:
            continue
        est = (4 * g * seq_pad * width * 2 * 2      # qkvo bf16, 2 buffers
               + g * seq_pad * seq_pad * 4          # logits f32
               + g * seq_pad * seq_pad * 2)         # probs bf16
        if est <= (_VMEM_BUDGET if g == 1 else 10_000_000):
            return g
    return None


def supports_fused(batch: int, seq_pad: int, width: int, heads: int,
                   dtype) -> bool:
    """Static gate: shapes/dtype the kernel is built and measured for."""
    return (
        jnp.dtype(dtype) == jnp.bfloat16
        and width % heads == 0
        # head dim 64 only: ViT-B/L/SigLIP all win (4.1x/3.1x/3.3x over
        # the XLA middle). head_dim 80 (ViT-H) won standalone (2.1x) but
        # measured 38% SLOWER in the full model at every group size.
        # Round 3 identified the cause: the XLA<->Pallas boundary
        # relayout tax (BENCHMARKS.md round-3 section) — XLA assigns its
        # surrounding GEMMs non-default layouts, so every custom-call
        # boundary pays a transposing copy of the activation stream.
        # ViT-H therefore runs the ALL-KERNEL block path instead
        # (ops/block.py, calibrated (264, 1280) entry: attn block 3.41 ms
        # vs 7.09 XLA standalone), which has no boundary to tax; this
        # lone-middle kernel stays hd-64 where the hybrid is proven.
        and width // heads == 64
        and seq_pad % 8 == 0
        and batch > 0
        and _pick_group(batch, seq_pad, width) is not None
        and jax.default_backend() == "tpu"
    )


def _kernel(q_ref, k_ref, v_ref, o_ref, *, heads: int, n_valid: int,
            scale: float, causal: bool):
    # scale is 1/sqrt(TRUE head_dim) — for padded-head callers (head slots
    # zero-padded to 128 lanes, ops/block.py padded path) the true head
    # dim differs from d // heads, so the caller passes it explicitly.
    q = q_ref[:]                       # (GROUP, SP, D) bf16
    k = k_ref[:]
    v = v_ref[:]
    g, sp, d = q.shape
    hd = d // heads
    col = jax.lax.broadcasted_iota(jnp.int32, (g, sp, sp), 2)
    keep = col < n_valid
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, (g, sp, sp), 1)
        keep = keep & (col <= row)
    for h in range(heads):
        sl = slice(h * hd, (h + 1) * hd)
        logits = jax.lax.dot_general(
            q[:, :, sl], k[:, :, sl],
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                              # (GROUP, SP, SP) f32
        logits = jnp.where(keep, logits * scale, -jnp.inf)
        m = jnp.max(logits, axis=2, keepdims=True)
        p = jnp.exp(logits - m)
        p = p / jnp.sum(p, axis=2, keepdims=True)
        o_ref[:, :, sl] = jax.lax.dot_general(
            p.astype(v.dtype), v[:, :, sl],
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("heads", "n_valid", "causal", "interpret", "scale"),
)
def fused_short_attention(
    q: jax.Array, k: jax.Array, v: jax.Array,
    heads: int, n_valid: int, causal: bool = False,
    interpret: bool = False, scale: float | None = None,
) -> jax.Array:
    """q/k/v (B, SP, D) bf16 natural layout -> (B, SP, D). Key columns
    >= n_valid are masked (and, with ``causal``, columns > row — the text
    tower's autoregressive mask); query rows >= n_valid return garbage the
    caller must not read. Gate with supports_fused() first.

    ``scale`` overrides the default 1/sqrt(D/heads) — used by the
    padded-head path (ops/block.py) where head slots are zero-padded to
    128 lanes and the TRUE head dim is smaller than D // heads."""
    b, sp, d = q.shape
    hd = d // heads
    group = _pick_group(b, sp, d)
    assert group is not None, "gate with supports_fused() first"
    spec = pl.BlockSpec((group, sp, d), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(
            _kernel, heads=heads, n_valid=n_valid,
            scale=scale if scale is not None else 1.0 / np.sqrt(hd),
            causal=causal,
        ),
        grid=(b // group,),
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


def _pad_causal_mask(sp: int, n_valid: int, causal: bool):
    """The mask the fused kernel applies natively, as an additive array for
    the XLA path: key columns >= n_valid (and, if causal, above-diagonal)
    get -inf."""
    col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, sp), 3)
    mask = jnp.where(col < n_valid, 0.0, -jnp.inf)
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, (1, 1, sp, sp), 2)
        colq = jax.lax.broadcasted_iota(jnp.int32, (1, 1, sp, sp), 3)
        mask = mask + jnp.where(colq <= row, 0.0, -jnp.inf)
    return mask


# ---------------------------------------------------------------------------
# GSPMD rule: the kernel is batch-parallel, so under pjit/GSPMD each chip
# runs it on its own batch shard — without this rule XLA would treat the
# custom call as replicated and insert all-gathers of q/k/v.
# ---------------------------------------------------------------------------


def _batch_only(sharding):
    """Keep only the batch-dim sharding (dim 0); SP/D replicate."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    spec = getattr(sharding, "spec", None)
    batch = spec[0] if spec is not None and len(spec) > 0 else None
    return NamedSharding(sharding.mesh, P(batch, None, None))


def _fsa_infer_sharding(heads, n_valid, causal, mesh, arg_shapes, shape):
    return _batch_only(arg_shapes[0].sharding)


def _fsa_partition(heads, n_valid, causal, mesh, arg_shapes, result_shape):
    sharding = _batch_only(arg_shapes[0].sharding)

    def lower_fn(q, k, v):
        return fused_short_attention(q, k, v, heads=heads, n_valid=n_valid,
                                     causal=causal)

    return mesh, lower_fn, sharding, (sharding,) * 3


@functools.partial(custom_partitioning, static_argnums=(3, 4, 5))
def _fused_attention_spmd(q, k, v, heads, n_valid, causal):
    return fused_short_attention(q, k, v, heads=heads, n_valid=n_valid,
                                 causal=causal)


_fused_attention_spmd.def_partition(
    infer_sharding_from_operands=_fsa_infer_sharding,
    partition=_fsa_partition,
    # Shardy propagation rule: batch factor shared across operands/result.
    # partition() still forces SP/D replicated on the enforced shardings.
    sharding_rule="b s d, b s d, b s d -> b s d",
)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_attention_trainable(q, k, v, heads: int, n_valid: int,
                              causal: bool = False):
    """Differentiable wrapper: Pallas fused forward + recompute-style
    backward (the gradient of the equivalent masked XLA attention,
    linearized at the same inputs — the standard flash-attention backward
    structure). Padded query rows receive zero cotangents from any caller
    that slices them off, and padded key columns are -inf-masked in the
    recompute, so no gradient leaks through the padding. Gate with
    supports_fused() first. Under pjit/GSPMD the SPMD rule above runs the
    kernel per batch shard (no gathers)."""
    return _fused_attention_spmd(q, k, v, heads, n_valid, causal)


def _fat_fwd(q, k, v, heads, n_valid, causal):
    out = _fused_attention_spmd(q, k, v, heads, n_valid, causal)
    return out, (q, k, v)


def _fat_bwd(heads, n_valid, causal, res, g):
    q, k, v = res
    sp = q.shape[1]
    mask = _pad_causal_mask(sp, n_valid, causal)

    def f(q_, k_, v_):
        return xla_attention(q_, k_, v_, heads=heads, mask=mask,
                             softmax_f32=True, out_dtype=q_.dtype)

    _, vjp = jax.vjp(f, q, k, v)
    return vjp(g)


fused_attention_trainable.defvjp(_fat_fwd, _fat_bwd)


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
