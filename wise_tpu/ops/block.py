"""Fused transformer-block kernels (Pallas TPU) — LN/GEMM/attention/MLP
residual blocks that never spill activations to HBM.

Motivation (BENCHMARKS.md roofline, round 2): with the fused attention
middle in place, one ViT-B/32 layer still costs ~4.0 ms at batch 512
against a 1.86 ms GEMM floor. The remaining ~1.7 ms is bandwidth:
LayerNorms (f32 passes over the (B, S, D) activations), the gelu pass over
the (B, S, 4D) MLP intermediate, residual adds, and the HBM round trips of
every intermediate between those XLA fusions. These kernels run a whole
residual block per grid step with everything resident in VMEM:

  fused_attn_block:  x + out_proj(MHA(LN1(x)))     [one kernel]
  fused_mlp_block:   x + proj(gelu(fc(LN2(x))))    [one kernel]

Weights ride in VMEM via constant-index blocks (fetched once, reused
across the batch grid — Mosaic skips copies for unchanged block indices),
so per-layer weight traffic is one read of the layer (~14 MB for ViT-B)
instead of one read per batch group.

Scope mirrors ops/attention.py: inference, bf16 activations, head_dim 64
towers, VMEM-feasible tilings only (``supports_fused_block``); everything
else stays on the XLA path. LayerNorm statistics and softmax run in f32
exactly like the XLA path (flax _compute_stats: var = E[x^2] - E[x]^2,
rsqrt(var + eps)); GEMMs accumulate f32 on the MXU and round to bf16 at
the same points the Dense layers do.
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

_EPS = 1e-5

# One grid step's working set must stay under the scoped-VMEM ceiling.
# Round-2 calibration: ~10 MB is safe for multi-buffered kernels, 12 MB
# validated at group 1 (ops/attention.py). Block kernels hold the layer
# weights resident on top of the activation blocks (constant-index blocks
# are fetched once, not per step), so the MLP kernel — whose fc+proj
# weights alone are 9.4 MB at ViT-B width — gets a larger allowance that
# assumes the resident weights are not double-buffered. Both budgets are
# calibrated on hardware with scripts/bench_block_kernels.py.
#
# The analytic estimates below are deliberately CONSERVATIVE fallbacks for
# shapes nobody has probed: round-3 hardware probes showed Mosaic's real
# allocation is ~3x below these formulas (weights and f32 temporaries are
# not double-buffered/live simultaneously), e.g. the L/14 attention block
# at "est 24 MB" compiles and runs at 5.35 ms. Production tower shapes
# therefore come from _CALIBRATED — per-(seq_pad, width) group choices
# measured on the v5e (scripts/bench_block_kernels.py + the round-3 probe
# session recorded in BENCHMARKS.md):
#
#   (56, 768)    ViT-B/32 @224: attn g=2 1.14 ms; single-MLP g=1 1.72 ms
#   (200, 768)   ViT-B/16 @224: attn g=1 2.24 ms (g=2 2.41, g=4 2.49);
#                single-MLP g=2 2.82 ms (split g=2 2.86)
#   (264, 1024)  ViT-L/14 @224: attn g=2 5.35 ms (g=1 6.19);
#                split-MLP g=2 6.75 ms (single g=1 6.94 — fc+proj 16.8 MB
#                resident is over budget; split holds one 8.4 MB weight)
#   (80, 512)    CLIP text B: formula picks (attn g=2, single g=4) —
#                measured +41% end-to-end (21.6k vs 15.4k queries/s)
#   (264, 1280)  ViT-H/14 @224 (head_dim 80 — the reference's DEFAULT
#                extract-features backbone): attn g=2 3.41 ms vs XLA 7.09
#                (g=1 3.49; the padded-head decomposition 5.04 — Mosaic
#                handles the 80-wide lane slices in-kernel, so the
#                monolithic kernel wins and hd!=64 is admitted via
#                calibration below); split-MLP g=2 4.71 ms vs XLA 4.86
#                (single g=1 4.94/g=2 5.33; wqkv+wo 13.1 MB resident
#                compiles fine — the formulas' 3x margin again)
#   (576, 1024)  SigLIP-384 (the reference's integration-test flagship):
#                attn g=2 3.58 ms vs XLA 7.83 (g=1 4.00); split-MLP g=1
#                3.86 / single g=2 3.97 vs XLA MLP 3.53 standalone —
#                kernel MLP still wins end-to-end (boundary-tax rule)
_CALIBRATED_ATTN = {(56, 768): 2, (200, 768): 1, (264, 1024): 2,
                    (264, 1280): 2, (576, 1024): 2}
#: (seq_pad, width) shapes whose SAVED-ACTIVATION training forward (the
#: res=True kernels, which stream one extra double-buffered (G, SP, 3D)/
#: (G, SP, FF) output past the calibrated inference groups) has actually
#: compiled and run on the v5e: the round-4 train-step A/Bs (B/32 1.008x,
#: B/16, L/14 1.013x — scripts/bench_train_step.py) and the H/14 remat
#: fine-tune (676.7 ms/step, MLP-split res path). Calibrated groups for
#: any OTHER shape must re-pass the res-aware analytic estimate before
#: the training forward will use them; failing that the group functions
#: fall back to the analytic loop and ultimately to the recompute
#: backward (residual None), never to a Mosaic scoped-vmem failure.
#: (576, 1024) — SigLIP-384 — is deliberately NOT here: its qkv residual
#: alone is ~14 MB/group at g=2.
_TRAIN_RES_VALIDATED = {(56, 768), (200, 768), (264, 1024), (264, 1280)}
#: (seq_pad, width) -> group at which the FLAT (merged (G*SP, D) rows)
#: attention-block variant beat the 3-D batched GEMMs on hardware. When a
#: shape's entry equals its _CALIBRATED_ATTN group, production runs flat.
#: Motivation: bf16 VMEM tiles are 16 sublanes, so each (SP, D) GEMM in a
#: batched group rounds SP up (56 -> 64 at ViT-B/32, ~14% wasted MXU
#: rows); the merged row count G*SP can be tile-exact.
_CALIBRATED_FLAT_ATTN: dict = {}
#: (seq_pad, width) -> ("single"|"split"|"singleflat"|"splitflat", group)
_CALIBRATED_MLP = {
    # (56, 768) g=1 re-confirmed end-to-end in round 4: isolated pair
    # probes (probe_flat56/probe_pair56, bf16 AND f32 stream) showed g=4
    # 0.2-0.4 ms/layer faster, but the production step A/B measured g=4
    # 0.7 ms SLOWER end-to-end (35.70 vs 36.36 ms, cos 1.0) — the
    # isolated-pair win does not survive composition with the full tower.
    (56, 768): ("single", 1),
    (200, 768): ("single", 2),
    (264, 1024): ("split", 2),
    (264, 1280): ("split", 2),
    (576, 1024): ("split", 1),
}
_VMEM_BUDGET = 10_000_000
_VMEM_BUDGET_MLP = 11_500_000
_VMEM_LIMIT_BYTES = 100 * 1024 * 1024  # cap passed to Mosaic, not a target


def _ln_f32(xf, scale, bias):
    """flax.linen.LayerNorm numerics (f32): var = max(E[x^2]-E[x]^2, 0)."""
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    mean2 = jnp.mean(xf * xf, axis=-1, keepdims=True)
    var = jnp.maximum(mean2 - mean * mean, 0.0)
    mul = jax.lax.rsqrt(var + _EPS) * scale
    return (xf - mean) * mul + bias


def _erf_f32(x):
    """erf for Mosaic: lax.erf/erfc have no Pallas TPU lowering (probed on
    hardware, round 3), so use Abramowitz & Stegun 7.1.26 — max abs error
    1.5e-7, ~50x below bf16 resolution; only exp() is transcendental."""
    s = jnp.where(x >= 0, 1.0, -1.0)  # sign via select (guaranteed lowering)
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return s * (1.0 - poly * jnp.exp(-a * a))


def _gelu_f32(h, act: str):
    """Activations expressed via exp() only — the one transcendental with a
    proven Mosaic lowering here (erf/erfc are unimplemented; sigmoid/tanh
    primitives unprobed). exp saturates cleanly in f32 so the rewrites are
    stable at both tails."""
    if act == "none":
        return h
    if act == "quick_gelu":
        # sigmoid(z) = 1 / (1 + exp(-z))
        return h / (1.0 + jnp.exp(-1.702 * h))
    if act == "gelu_tanh":
        # tanh(z) = 1 - 2/(exp(2z) + 1)
        z = np.float32(np.sqrt(2.0 / np.pi)) * (h + 0.044715 * h * h * h)
        tanh_z = 1.0 - 2.0 / (jnp.exp(2.0 * z) + 1.0)
        return 0.5 * h * (1.0 + tanh_z)
    # exact gelu via the in-kernel erf (jax.nn.gelu approximate=False
    # lowers to erfc, which Mosaic lacks)
    return 0.5 * h * (1.0 + _erf_f32(h * np.float32(1.0 / np.sqrt(2.0))))


# ---------------------------------------------------------------------------
# attention block: x + out_proj(MHA(LN1(x)))
# ---------------------------------------------------------------------------


def _attn_block_kernel(
    x_ref, ln_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref, o_ref, *rest,
    heads: int, n_valid: int, scale: float, causal: bool,
    flat: bool = False,
):
    # trailing refs: [qkv_out (training residual — see fused_attn_block_res)]
    # + att scratch
    if len(rest) == 2:
        qkv_out, att_ref = rest
    else:
        qkv_out, (att_ref,) = None, rest
    x = x_ref[:]                              # (G, SP, D) bf16
    g, sp, d = x.shape
    hd = d // heads
    y = _ln_f32(
        x.astype(jnp.float32), ln_ref[0, :], ln_ref[1, :]
    ).astype(x.dtype)
    if flat:
        # 2-D GEMM over the merged (G*SP, D) rows: batched (SP, D) GEMMs
        # pay sublane-tile rounding (bf16 tiles are 16 rows — SP=56 rounds
        # to 64, ~14% wasted MXU rows at ViT-B/32 shapes) while the merged
        # row count is tile-friendly; the reshape is a VMEM-local relayout
        qkv = jax.lax.dot_general(
            y.reshape(g * sp, d), wqkv_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(g, sp, 3 * d)
    else:
        qkv = jax.lax.dot_general(
            y, wqkv_ref[:], dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    qkv = (qkv + bqkv_ref[0, :]).astype(x.dtype)   # (G, SP, 3D)
    if qkv_out is not None:
        # training residual is saved at the WEIGHT dtype (bf16), not the
        # stream dtype: an f32 stream would double the saved bytes and a
        # ViT-L/14 B=64 train step OOMs 16 GB HBM on f32 residuals
        # (~11 GB across 24 layers); the backward's cut cotangent is cast
        # anyway (_attn_saved_bwd) and the looseness is bf16-rounding
        # class either way.
        qkv_out[:] = qkv.astype(qkv_out.dtype)
    col = jax.lax.broadcasted_iota(jnp.int32, (g, sp, sp), 2)
    keep = col < n_valid
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, (g, sp, sp), 1)
        keep = keep & (col <= row)
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
    if flat:
        out = jax.lax.dot_general(
            att_ref[:].reshape(g * sp, d), wo_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(g, sp, d)
    else:
        out = jax.lax.dot_general(
            att_ref[:], wo_ref[:], dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    o_ref[:] = x + (out + bo_ref[0, :]).astype(x.dtype)


def _attn_group(batch: int, seq_pad: int, width: int,
                res: bool = False):
    """Batch group for the attention block, in MEASURED preference order:
    at ViT-B/32 step shapes g=2 ran 1.14/1.28 ms across two hardware
    sessions vs 1.24/1.35 at g=8 and 1.49/1.55 at g=4 (scripts/
    bench_block_kernels.py) — smaller blocks pipeline better here, so g=2
    leads whenever it fits. ``res=True`` (the saved-activation training
    forward) adds the double-buffered (G, SP, 3D) qkv residual OUTPUT to
    the analytic estimate — a shape the inference estimate admits near
    the budget could otherwise pass the gate and then fail Mosaic's
    VMEM check when training streams the extra output. Calibrated
    entries are kept as-is only where the TRAINING forward actually ran
    on hardware (_TRAIN_RES_VALIDATED); other calibrated shapes must
    re-pass the res-aware analytic estimate or they fall through to the
    analytic loop (smaller group, or None -> recompute backward)."""

    def est(g):
        blk = g * seq_pad * width
        return (
            4 * width * width * 2   # qkv + out-proj weights bf16
            + 2 * 2 * blk * 2       # x, out: double-buffered bf16
            + blk * 2               # att scratch bf16
            + 3 * blk * 2           # qkv bf16
            + 3 * blk * 4           # qkv f32 pre-round + LN f32 temps
            + g * seq_pad * seq_pad * (4 + 2)
            + (2 * 3 * blk * 2 if res else 0)  # qkv residual out x2 bufs
        )

    cal = _CALIBRATED_ATTN.get((seq_pad, width))
    if cal is not None and batch % cal == 0:
        if (not res or (seq_pad, width) in _TRAIN_RES_VALIDATED
                or est(cal) <= _VMEM_BUDGET):
            return cal
    for g in (2, 8, 4, 1):
        if batch % g:
            continue
        if est(g) <= _VMEM_BUDGET:
            return g
    return None


#: (seq_pad, width) -> group for the POOLED last-layer attention block,
#: measured on the v5e (scripts/probe_pooled_block.py). Groups must be
#: multiples of 8: Mosaic requires the (group, D) OUTPUT block's sublane
#: dim divisible by 8, so the full kernel's measured-best g=2 is
#: inadmissible here. The pooled kernel's working set is smaller than the
#: full block's (no (G, SP, SP) attention matrix, no (G, SP, D) output or
#: qkv q-third), so larger groups fit where the full kernel's wouldn't.
#: Winners below from scripts/calibrate_pooled_block.py (v5e, 50-iter
#: chains, best group vs the full fused block at each tower's production
#: step shape):
#:   (56, 768)   ViT-B/32 vision  g=32: 0.665 ms vs 1.285 full block
#:   (200, 768)  ViT-B/16 vision  g=16: 1.199 ms vs 2.335
#:   (264, 1024) ViT-L/14 vision  g=16: 1.269 ms vs 2.634
#:   (264, 1280) ViT-H/14 vision  g=8 : 1.855 ms vs 3.607
#:   (64, 1024)  SigLIP text      g=64: 0.590 ms vs 0.749 XLA pooled
#:   (80, 512)   causal last-row  g=32: 0.455 ms vs 0.725 (shape kept for
#:               future static-row causal towers; CLAP captions pool at a
#:               per-sample data-dependent row and stay on the full path)
_CALIBRATED_POOLED: dict = {
    (56, 768): 32,
    (200, 768): 16,
    (264, 1024): 16,
    (264, 1280): 8,
    (64, 1024): 64,
    (80, 512): 32,
    #: (80, 768) = CLAP caption tower (GPT2-small width). Measured via the
    #: DYNAMIC-row sweep (--dyn): kernel beats the full block at B=256
    #: (0.498 ms g=32 vs 1.055) and B=64 (0.208 g=16 vs 0.502). Entry
    #: admits the shape; the dyn path picks its group per-batch below.
    (80, 768): 32,
}


def _pooled_group(batch: int, seq_pad: int, width: int):
    """Batch group for the pooled attention block (multiple of 8 or the
    whole batch; see _CALIBRATED_POOLED). Analytic fallback mirrors
    _attn_group's conservative style with the pooled kernel's smaller
    working set (kv is 2/3 of qkv; no attention matrix)."""
    cal = _CALIBRATED_POOLED.get((seq_pad, width))
    if cal is not None and batch % cal == 0:
        return cal
    wbytes = 4 * width * width * 2
    for g in (8, 16):
        if batch % g:
            continue
        blk = g * seq_pad * width
        est = (
            wbytes
            + 2 * blk * 2           # x: double-buffered bf16
            + blk * 4               # LN f32 temps
            + 2 * blk * (4 + 2) * 2 // 3  # kv f32 + bf16 (2/3 of qkv)
            + g * width * (2 + 2 + 2)     # q, att scratch, out
        )
        if est <= _VMEM_BUDGET:
            return g
    return None


def _pooled_dyn_group(batch: int, seq_pad: int, width: int):
    """Batch group for the DYNAMIC-row pooled kernel. The hardware sweep
    (scripts/calibrate_pooled_block.py --dyn, v5e, 100-iter chains) shows
    the winning group SCALES WITH BATCH — B=512 wants g=64 (0.616 ms vs
    0.856 at g=8, (80,512)), B=64 wants g=8/16 (0.130/0.203 vs 0.377 at
    g=64) — and clamp(batch//8, 8, 64) picks the measured winner at every
    swept point for both text shapes ((80,512) B∈{64,512}, (80,768)
    B∈{64,256}). Admission rides _pooled_group (calibrated table +
    conservative analytic fallback); the clamp then only shrinks to a
    group that divides the batch."""
    if _pooled_group(batch, seq_pad, width) is None:
        return None
    g = max(8, min(64, batch // 8))
    while g >= 8:
        if batch % g == 0:
            return g
        g //= 2
    return None


def supports_fused_block_pooled(batch: int, seq_pad: int, width: int,
                                heads: int, dtype) -> bool:
    """Static gate for the pooled last-layer kernel: same admission rules
    as supports_fused_block, but keyed on _pooled_group (the pooled
    kernel's output-block constraint forces groups >= 8)."""
    hd = width // heads if width % heads == 0 else 0
    if hd == 0 or (hd != 64 and (seq_pad, width) not in _CALIBRATED_ATTN):
        return False
    return (
        jnp.dtype(dtype) == jnp.bfloat16
        and width % 128 == 0
        and seq_pad % 8 == 0
        and batch > 0
        and _pooled_group(batch, seq_pad, width) is not None
        and jax.default_backend() == "tpu"
    )


def mlp_choice(batch: int, seq_pad: int, width: int):
    """Production MLP-kernel selection: ("single"|"split", group) or None.
    Calibrated shapes take their measured winner; others fall back to the
    conservative single-then-split estimate chain."""
    cal = _CALIBRATED_MLP.get((seq_pad, width))
    if cal is not None and batch % cal[1] == 0:
        return cal
    g = _mlp_group(batch, seq_pad, width)
    if g is not None:
        return ("single", g)
    g = _mlp_split_group(batch, seq_pad, width)
    if g is not None:
        return ("split", g)
    return None


def _mlp_group(batch: int, seq_pad: int, width: int, res: bool = False):
    """Batch group for the MLP block: fc+proj weights resident (8D^2 bf16)
    + x/out blocks + the (G, SP, 4D) intermediate. ``res=True`` adds the
    double-buffered pre-gelu residual OUTPUT the saved-activation
    training forward streams (see _attn_group; calibrated entries obey
    the same _TRAIN_RES_VALIDATED rule)."""

    def est(g):
        blk = g * seq_pad * width
        return (
            8 * width * width * 2   # fc + proj weights bf16
            + 2 * 2 * blk * 2       # x, out double-buffered bf16
            + blk * 4 + blk * 2     # LN f32 temp + y bf16
            + 4 * blk * 2           # h bf16
            + 4 * blk * 4           # h f32 pre-gelu
            + (2 * 4 * blk * 2 if res else 0)  # h residual out x2 bufs
        )

    cal = _CALIBRATED_MLP.get((seq_pad, width))
    if (cal is not None and cal[0] in ("single", "singleflat")
            and batch % cal[1] == 0):
        if (not res or (seq_pad, width) in _TRAIN_RES_VALIDATED
                or est(cal[1]) <= _VMEM_BUDGET_MLP):
            return cal[1]
    for g in (8, 4, 2, 1):
        if batch % g:
            continue
        if est(g) <= _VMEM_BUDGET_MLP:
            return g
    return None


def supports_fused_block(batch: int, seq_pad: int, width: int, heads: int,
                         dtype) -> bool:
    """Static gate for the production block path, keyed on the ATTENTION
    block kernel. The MLP half additionally requires ``_mlp_group`` to
    admit the shape (checked at the call site); when it does, production
    runs BOTH kernels: standalone the MLP kernel is marginally slower
    than XLA's MLP (1.72 vs 1.63 ms/layer at ViT-B/32 step shapes), but
    all-kernel layers avoid the per-layer {2,1,0}<->{2,0,1} relayout
    copies XLA inserts at every Pallas<->XLA boundary (~1.1 ms/layer),
    measured 38.2 vs 51.1 ms per production step end-to-end
    (scripts/bench_encoder_ab.py, round 3)."""
    hd = width // heads if width % heads == 0 else 0
    # head_dim 64 is admitted generally (the formula fallbacks hold);
    # other head dims (80: ViT-H — the reference's default backbone)
    # only via a hardware-calibrated (seq_pad, width) entry. The ViT-H
    # probe showed Mosaic handles the 80-wide in-kernel lane slices fine
    # (attn block 3.41 ms vs 7.09 XLA, BENCHMARKS.md round 3) — the
    # round-2 "head_dim 80 is 38% slower" finding was the XLA<->Pallas
    # boundary relayout tax, which all-kernel layers don't pay.
    if hd == 0 or (hd != 64 and (seq_pad, width) not in _CALIBRATED_ATTN):
        return False
    return (
        jnp.dtype(dtype) == jnp.bfloat16
        and width % 128 == 0
        and seq_pad % 8 == 0
        and batch > 0
        and _attn_group(batch, seq_pad, width) is not None
        and jax.default_backend() == "tpu"
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "heads", "n_valid", "causal", "interpret", "group", "flat"
    ),
)
def fused_attn_block(
    x: jax.Array, ln_scale: jax.Array, ln_bias: jax.Array,
    wqkv: jax.Array, bqkv: jax.Array, wo: jax.Array, bo: jax.Array,
    heads: int, n_valid: int, causal: bool = False,
    interpret: bool = False, group: int | None = None,
    flat: bool | None = None,
) -> jax.Array:
    """x (B, SP, D) bf16 -> x + out_proj(MHA(LN(x))). Weights bf16
    (wqkv (D, 3D), wo (D, D)); LN params f32. Key columns >= n_valid are
    masked; padded query rows carry garbage the caller never reads (they
    stay garbage through the residual, exactly like the XLA path).
    ``flat`` runs the QKV/out GEMMs on merged (G*SP, D) rows (see
    _attn_block_kernel); default comes from the calibration table."""
    b, sp, d = x.shape
    group = group or _attn_group(b, sp, d)
    if flat is None:
        flat = _CALIBRATED_FLAT_ATTN.get((sp, d)) == group
    assert group is not None, "gate with supports_fused_block() first"
    xspec = pl.BlockSpec((group, sp, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    ln = jnp.stack([ln_scale, ln_bias]).astype(jnp.float32)
    return pl.pallas_call(
        functools.partial(
            _attn_block_kernel, heads=heads, n_valid=n_valid,
            scale=1.0 / np.sqrt(d // heads), causal=causal, flat=flat,
        ),
        grid=(b // group,),
        in_specs=[
            xspec,
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
            flops=2 * b * sp * (4 * d * d + 2 * sp * d) + 4 * b * sp * sp * d,
            bytes_accessed=4 * b * sp * d * 2 + 8 * d * d * 2,
            transcendentals=b * heads * sp * sp,
        ),
    )(x, ln, wqkv, bqkv.reshape(1, -1), wo, bo.reshape(1, -1))


# ---------------------------------------------------------------------------
# pooled attention block: the LAST layer of a cls-pooled tower only needs
# its output at the pooled row (VisionTransformer reads x[:, 0] and the
# CLAP caption tower reads the last real token), yet the full block
# computes attention output + MLP for every padded row. This variant
# computes k/v for all rows but q/out-proj for the single pooled row —
# identical math for that row (same contractions, same f32 accumulation) —
# and returns (B, D). The caller runs the last MLP on the pooled row as
# plain (B, D) XLA ops (a ~0.03 ms GEMM; 2-D tensors don't participate in
# the {2,0,1} relayout tax). Saves ~1 layer of compute per tower pass:
# at ViT-B/32 step shapes the full last layer costs 2.86 ms where the
# pooled path needs ~0.7 ms (kv GEMM) + noise.
# ---------------------------------------------------------------------------


def _attn_block_pooled_kernel(
    x_ref, ln_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref, o_ref, att_ref,
    *, heads: int, n_valid: int, scale: float, pool_row: int, causal: bool,
):
    x = x_ref[:]                              # (G, SP, D) bf16
    g, sp, d = x.shape
    hd = d // heads
    y = _ln_f32(
        x.astype(jnp.float32), ln_ref[0, :], ln_ref[1, :]
    ).astype(x.dtype)
    # k/v for every row (one (G*SP, D) x (D, 2D) GEMM-equivalent)...
    kv = jax.lax.dot_general(
        y, wqkv_ref[:, d:], dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    kv = (kv + bqkv_ref[0, d:]).astype(x.dtype)   # (G, SP, 2D)
    # ...but q only for an 8-row aligned WINDOW around the pooled row.
    # A single-row q would make the logits dot (G, hd) x (G, SP, hd),
    # whose empty lhs-non-contracting dim Mosaic's dot attr cannot
    # express, and the VPU alternatives need a (G, 1, hd) middle-dim
    # expand that tpu.reshape rejects (both probed on hardware). Static
    # middle-index SLICING lowers fine, so: attend 8 query rows on the
    # MXU (a sublane-tile-exact M=8 matmul) and slice out the pooled
    # row's result — still 1/7th the attention work of the full block at
    # SP=56, and the q GEMM stays 8 rows instead of SP.
    w0 = min(pool_row - pool_row % 8, sp - 8)
    roff = pool_row - w0
    q8 = jax.lax.dot_general(
        y[:, w0:w0 + 8, :], wqkv_ref[:, :d],
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    q8 = (q8 + bqkv_ref[0, :d]).astype(x.dtype)   # (G, 8, D)
    col = jax.lax.broadcasted_iota(jnp.int32, (g, 8, sp), 2)
    keep = col < n_valid
    if causal:
        # only row `roff` of the window survives, so every window row
        # gets the POOLED row's causal mask (column 0 is always kept —
        # no all-masked softmax rows)
        keep = keep & (col <= pool_row)
    for h in range(heads):
        sl = slice(h * hd, (h + 1) * hd)
        k = kv[:, :, sl]
        v = kv[:, :, d + h * hd:d + (h + 1) * hd]
        logits = jax.lax.dot_general(
            q8[:, :, sl], k,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                                          # (G, 8, SP)
        logits = jnp.where(keep, logits * scale, -jnp.inf)
        m = jnp.max(logits, axis=2, keepdims=True)
        p = jnp.exp(logits - m)
        p = p / jnp.sum(p, axis=2, keepdims=True)
        att8 = jax.lax.dot_general(
            p.astype(v.dtype), v,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                                          # (G, 8, hd)
        att_ref[:, sl] = att8[:, roff, :].astype(att_ref.dtype)
    out = jax.lax.dot_general(
        att_ref[:], wo_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[:] = x[:, pool_row, :] + (out + bo_ref[0, :]).astype(x.dtype)


def _pooled_block_xla(x, ln_scale, ln_bias, wqkv, bqkv, wo, bo,
                      heads, n_valid, pool_row, causal):
    """Plain-ops pooled attention block — the same math as the Pallas
    kernel (q/out-proj restricted to the pooled row, k/v full, f32
    softmax). Used when _pooled_group admits no group, e.g. a dp shard
    whose per-chip batch is below the kernel's 8-sublane output minimum."""
    b, sp, d = x.shape
    hd = d // heads
    xf = x.astype(jnp.float32)
    y = _ln_f32(xf, ln_scale, ln_bias).astype(x.dtype)
    kv = y @ wqkv[:, d:] + bqkv[d:]
    q = y[:, pool_row, :] @ wqkv[:, :d] + bqkv[:d]
    qh = q.reshape(b, heads, hd)
    kh = kv[..., :d].reshape(b, sp, heads, hd)
    vh = kv[..., d:].reshape(b, sp, heads, hd)
    logits = jnp.einsum(
        "bhd,bkhd->bhk", qh.astype(jnp.float32), kh.astype(jnp.float32)
    ) * (1.0 / np.sqrt(hd))
    col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, sp), 2)
    keep = col < n_valid
    if causal:
        keep = keep & (col <= pool_row)
    logits = jnp.where(keep, logits, -jnp.inf)
    p = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    att = jnp.einsum("bhk,bkhd->bhd", p, vh).reshape(b, d)
    return x[:, pool_row, :] + (att @ wo + bo).astype(x.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("heads", "n_valid", "pool_row", "causal", "interpret",
                     "group"),
)
def fused_attn_block_pooled(
    x: jax.Array, ln_scale: jax.Array, ln_bias: jax.Array,
    wqkv: jax.Array, bqkv: jax.Array, wo: jax.Array, bo: jax.Array,
    heads: int, n_valid: int, pool_row: int = 0, causal: bool = False,
    interpret: bool = False, group: int | None = None,
) -> jax.Array:
    """x (B, SP, D) bf16 -> (x + out_proj(MHA(LN(x))))[:, pool_row] as
    (B, D). Same contract as fused_attn_block restricted to one query row;
    key columns >= n_valid are masked, causal additionally masks columns
    > pool_row (the causal row-pool case: CLAP's caption tower pools the
    last real token)."""
    b, sp, d = x.shape
    group = group or _pooled_group(b, sp, d)
    if group is None:
        # inadmissible shape (e.g. per-shard batch < 8 under dp
        # partitioning): same math, plain ops
        return _pooled_block_xla(x, ln_scale, ln_bias, wqkv, bqkv, wo, bo,
                                 heads, n_valid, pool_row, causal)
    xspec = pl.BlockSpec((group, sp, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((group, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    ln = jnp.stack([ln_scale, ln_bias]).astype(jnp.float32)
    return pl.pallas_call(
        functools.partial(
            _attn_block_pooled_kernel, heads=heads, n_valid=n_valid,
            scale=1.0 / np.sqrt(d // heads), pool_row=pool_row,
            causal=causal,
        ),
        grid=(b // group,),
        in_specs=[
            xspec,
            const((2, d)),
            const((d, 3 * d)),
            const((1, 3 * d)),
            const((d, d)),
            const((1, d)),
        ],
        out_specs=ospec,
        out_shape=jax.ShapeDtypeStruct((b, d), x.dtype),
        scratch_shapes=[pltpu.VMEM((group, d), x.dtype)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT_BYTES,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * sp * d * 2 * d + 4 * b * d * d + 4 * b * sp * d,
            bytes_accessed=b * sp * d * 2 + b * d * 2 + 8 * d * d * 2,
            transcendentals=b * heads * sp,
        ),
    )(x, ln, wqkv, bqkv.reshape(1, -1), wo, bo.reshape(1, -1))


# ---------------------------------------------------------------------------
# dynamic-row pooled attention block: the same last-layer saving for towers
# whose pooled row is DATA-DEPENDENT per example — CLIP text pools at the
# argmax/EOT token (models/clip/model.py TextTransformer, mirroring
# open_clip) and the CLAP caption tower pools at each caption's last real
# token (reference: /root/reference/src/feature/microsoft_clap.py text
# path). The row indices are known before the layer runs (a function of the
# token ids only), so the final layer still only needs q/out-proj/MLP at
# one row per example. Mosaic has no per-example dynamic indexing, so the
# host-side dispatcher turns the rows into a ONE-HOT (B, SP) matrix and an
# additive key mask (B, SP); inside the kernel the pooled x / LN(x) rows
# are gathered with batched one-hot MXU dots (exact: one nonzero per row,
# f32 accumulation) and the causal/valid masking is the precomputed
# additive mask — everything lowers as batched dot_general + broadcasts.
# ---------------------------------------------------------------------------


def _attn_block_pooled_dyn_kernel(
    x_ref, oh_ref, km_ref, ln_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref,
    o_ref, att_ref, *, heads: int, scale: float,
):
    x = x_ref[:]                              # (G, SP, D) bf16
    g, sp, d = x.shape
    hd = d // heads
    y = _ln_f32(
        x.astype(jnp.float32), ln_ref[0, :], ln_ref[1, :]
    ).astype(x.dtype)
    # k/v for every row, exactly like the static pooled kernel
    kv = jax.lax.dot_general(
        y, wqkv_ref[:, d:], dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    kv = (kv + bqkv_ref[0, d:]).astype(x.dtype)   # (G, SP, 2D)
    # gather each example's pooled row of x and LN(x) with one-hot MXU
    # dots. The q side needs an 8-row window for the MXU (single-row dots
    # don't lower — see the static kernel), so the one-hot row is
    # broadcast to 8 identical query rows and row 0 is read back at the
    # end. One nonzero per one-hot row + f32 accumulation = the gather is
    # bit-exact.
    # oh_ref/km_ref arrive as (G, 1, SP): Mosaic can't shape-cast a 2D
    # vector to (G, 1, SP) in-kernel ("infer-vector-layout: unsupported
    # shape cast" on the real lowering), so the unit dim is materialised
    # host-side and only BROADCAST (supported) here.
    oh8 = jnp.broadcast_to(oh_ref[:], (g, 8, sp))
    x8 = jax.lax.dot_general(
        oh8, x, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )                                          # (G, 8, D) f32, exact rows
    y8 = jax.lax.dot_general(
        oh8, y, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    q8 = jax.lax.dot_general(
        y8, wqkv_ref[:, :d],
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    q8 = (q8 + bqkv_ref[0, :d]).astype(x.dtype)   # (G, 8, D)
    km = km_ref[:]                                # (G, 1, SP) additive f32
    for h in range(heads):
        sl = slice(h * hd, (h + 1) * hd)
        k = kv[:, :, sl]
        v = kv[:, :, d + h * hd:d + (h + 1) * hd]
        logits = jax.lax.dot_general(
            q8[:, :, sl], k,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale + km                             # (G, 8, SP)
        m = jnp.max(logits, axis=2, keepdims=True)
        p = jnp.exp(logits - m)
        p = p / jnp.sum(p, axis=2, keepdims=True)
        att8 = jax.lax.dot_general(
            p.astype(v.dtype), v,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                                          # (G, 8, hd)
        att_ref[:, sl] = att8[:, 0, :].astype(att_ref.dtype)
    out = jax.lax.dot_general(
        att_ref[:], wo_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[:] = x8[:, 0, :].astype(x.dtype) + (out + bo_ref[0, :]).astype(
        x.dtype
    )


def _pooled_block_xla_dyn(x, rows, ln_scale, ln_bias, wqkv, bqkv, wo, bo,
                          heads, n_valid, causal):
    """Plain-ops dynamic-row pooled attention block — the same math as the
    Pallas kernel with per-example take_along_axis gathers. Used on CPU /
    f32 / shapes the kernel doesn't admit."""
    b, sp, d = x.shape
    hd = d // heads
    xf = x.astype(jnp.float32)
    y = _ln_f32(xf, ln_scale, ln_bias).astype(x.dtype)
    kv = y @ wqkv[:, d:] + bqkv[d:]
    idx = rows[:, None, None]
    yq = jnp.take_along_axis(y, idx.astype(jnp.int32), axis=1)[:, 0]
    q = yq @ wqkv[:, :d] + bqkv[:d]
    qh = q.reshape(b, heads, hd)
    kh = kv[..., :d].reshape(b, sp, heads, hd)
    vh = kv[..., d:].reshape(b, sp, heads, hd)
    logits = jnp.einsum(
        "bhd,bkhd->bhk", qh.astype(jnp.float32), kh.astype(jnp.float32)
    ) * (1.0 / np.sqrt(hd))
    col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, sp), 2)
    keep = col < n_valid
    if causal:
        keep = keep & (col <= rows[:, None, None])
    logits = jnp.where(keep, logits, -jnp.inf)
    p = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    att = jnp.einsum("bhk,bkhd->bhd", p, vh).reshape(b, d)
    xp = jnp.take_along_axis(x, idx.astype(jnp.int32), axis=1)[:, 0]
    return xp + (att @ wo + bo).astype(x.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("heads", "n_valid", "causal", "interpret", "group"),
)
def fused_attn_block_pooled_dyn(
    x: jax.Array, rows: jax.Array, ln_scale: jax.Array, ln_bias: jax.Array,
    wqkv: jax.Array, bqkv: jax.Array, wo: jax.Array, bo: jax.Array,
    heads: int, n_valid: int, causal: bool = False,
    interpret: bool = False, group: int | None = None,
) -> jax.Array:
    """x (B, SP, D) bf16, rows (B,) int32 -> the attention block's output
    at each example's own row, as (B, D). Same contract as
    fused_attn_block_pooled with a per-example pool row; key columns >=
    n_valid are masked, causal additionally masks columns > rows[b]."""
    b, sp, d = x.shape
    group = group or _pooled_dyn_group(b, sp, d)
    if group is None:
        return _pooled_block_xla_dyn(x, rows, ln_scale, ln_bias, wqkv,
                                     bqkv, wo, bo, heads, n_valid, causal)
    # one-hot + mask materialised as (B, 1, SP) — the unit dim must exist
    # in HBM because Mosaic rejects the in-kernel 2D->3D shape cast
    col = jax.lax.broadcasted_iota(jnp.int32, (b, 1, sp), 2)
    r3 = rows[:, None, None]
    oh = (col == r3).astype(x.dtype)
    keep = col < n_valid
    if causal:
        keep = keep & (col <= r3)
    km = jnp.where(keep, 0.0, -jnp.inf).astype(jnp.float32)
    xspec = pl.BlockSpec((group, sp, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    rspec = pl.BlockSpec((group, 1, sp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((group, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    ln = jnp.stack([ln_scale, ln_bias]).astype(jnp.float32)
    return pl.pallas_call(
        functools.partial(
            _attn_block_pooled_dyn_kernel, heads=heads,
            scale=1.0 / np.sqrt(d // heads),
        ),
        grid=(b // group,),
        in_specs=[
            xspec,
            rspec,
            rspec,
            const((2, d)),
            const((d, 3 * d)),
            const((1, 3 * d)),
            const((d, d)),
            const((1, d)),
        ],
        out_specs=ospec,
        out_shape=jax.ShapeDtypeStruct((b, d), x.dtype),
        scratch_shapes=[pltpu.VMEM((group, d), x.dtype)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT_BYTES,
        ),
        cost_estimate=pl.CostEstimate(
            flops=(2 * b * sp * d * 2 * d + 4 * b * d * d
                   + 4 * b * sp * d + 2 * 2 * b * 8 * sp * d),
            bytes_accessed=b * sp * d * 2 + b * d * 2 + 8 * d * d * 2,
            transcendentals=b * heads * sp,
        ),
    )(x, oh, km, ln, wqkv, bqkv.reshape(1, -1), wo, bo.reshape(1, -1))


def _mlp_block_kernel(
    x_ref, ln_ref, wfc_ref, bfc_ref, wproj_ref, bproj_ref, o_ref, *rest,
    act: str, flat: bool = False,
):
    # trailing refs: [hpre_out (training residual — the PRE-gelu fc output
    # rounded to the activation dtype; see fused_mlp_block_res)]
    hpre_out = rest[0] if rest else None
    x = x_ref[:]                              # (G, SP, D) bf16
    g, sp, d = x.shape
    y = _ln_f32(
        x.astype(jnp.float32), ln_ref[0, :], ln_ref[1, :]
    ).astype(x.dtype)
    if flat:                                   # see _attn_block_kernel
        y = y.reshape(g * sp, d)
    dims = (((1,), (0,)), ((), ())) if flat else (((2,), (0,)), ((), ()))
    h = jax.lax.dot_general(
        y, wfc_ref[:], dimension_numbers=dims,
        preferred_element_type=jnp.float32,
    )
    h = h + bfc_ref[0, :]
    if hpre_out is not None:
        ff = h.shape[-1]
        # weight-dtype residual — see _attn_block_kernel's qkv_out note
        hpre_out[:] = (h.reshape(g, sp, ff) if flat else h).astype(
            hpre_out.dtype)
    h = _gelu_f32(h, act).astype(x.dtype)
    out = jax.lax.dot_general(
        h, wproj_ref[:], dimension_numbers=dims,
        preferred_element_type=jnp.float32,
    )
    if flat:
        out = out.reshape(g, sp, d)
    o_ref[:] = x + (out + bproj_ref[0, :]).astype(x.dtype)


@functools.partial(
    jax.jit, static_argnames=("act", "interpret", "group", "flat")
)
def fused_mlp_block(
    x: jax.Array, ln_scale: jax.Array, ln_bias: jax.Array,
    wfc: jax.Array, bfc: jax.Array, wproj: jax.Array, bproj: jax.Array,
    act: str = "gelu", interpret: bool = False, group: int | None = None,
    flat: bool | None = None,
) -> jax.Array:
    """x (B, SP, D) bf16 -> x + proj(gelu(fc(LN(x)))). wfc (D, 4D),
    wproj (4D, D) bf16; LN params f32; act in {gelu, quick_gelu,
    gelu_tanh} (gelu computed in f32 inside the kernel). ``flat`` runs
    the GEMMs on merged (G*SP, D) rows (see _attn_block_kernel);
    default comes from the calibration table ("singleflat" variant)."""
    b, sp, d = x.shape
    ff = wfc.shape[1]
    group = group or _mlp_group(b, sp, d)
    if flat is None:
        cal = _CALIBRATED_MLP.get((sp, d))
        flat = cal is not None and cal == ("singleflat", group)
    assert group is not None, "gate with supports_fused_block() first"
    xspec = pl.BlockSpec((group, sp, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    ln = jnp.stack([ln_scale, ln_bias]).astype(jnp.float32)
    return pl.pallas_call(
        functools.partial(_mlp_block_kernel, act=act, flat=flat),
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
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT_BYTES,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * sp * d * ff,
            bytes_accessed=2 * b * sp * d * 2 + 2 * d * ff * 2,
            transcendentals=b * sp * ff,
        ),
    )(x, ln, wfc, bfc.reshape(1, -1), wproj, bproj.reshape(1, -1))


# ---------------------------------------------------------------------------
# GSPMD rules: the block kernels are batch-parallel — under pjit each chip
# runs them on its own batch shard with the weights replicated; without a
# rule XLA would treat the custom calls as replicated and gather x.
# ---------------------------------------------------------------------------


def _x_batch_only(sharding):
    spec = getattr(sharding, "spec", None)
    batch = spec[0] if spec is not None and len(spec) > 0 else None
    return NamedSharding(sharding.mesh, P(batch, None, None))


def _replicated_like(mesh, shape):
    return NamedSharding(mesh, P(*(None for _ in shape.shape)))


def _block_infer(*args):
    # (static..., mesh, arg_shapes, result_shape) — statics are splatted
    arg_shapes = args[-2]
    return _x_batch_only(arg_shapes[0].sharding)


def _make_block_partition(impl, static_names):
    def partition(*args):
        statics = args[:-3]
        mesh, arg_shapes, _result_shape = args[-3:]
        xsh = _x_batch_only(arg_shapes[0].sharding)
        arg_shardings = (xsh,) + tuple(
            _replicated_like(mesh, a) for a in arg_shapes[1:]
        )

        def lower_fn(x, *weights):
            return impl(x, *weights, **dict(zip(static_names, statics)))

        return mesh, lower_fn, xsh, arg_shardings

    return partition


@functools.partial(custom_partitioning, static_argnums=(7, 8, 9))
def fused_attn_block_spmd(x, ln_s, ln_b, wqkv, bqkv, wo, bo,
                          heads, n_valid, causal):
    return fused_attn_block(x, ln_s, ln_b, wqkv, bqkv, wo, bo,
                            heads=heads, n_valid=n_valid, causal=causal)


fused_attn_block_spmd.def_partition(
    infer_sharding_from_operands=_block_infer,
    partition=_make_block_partition(
        lambda x, ln_s, ln_b, wqkv, bqkv, wo, bo, **kw: fused_attn_block(
            x, ln_s, ln_b, wqkv, bqkv, wo, bo, **kw
        ),
        ("heads", "n_valid", "causal"),
    ),
    sharding_rule="b s d, e, f, g h, i, j k, l -> b s d",
)


@functools.partial(custom_partitioning, static_argnums=(7, 8, 9, 10))
def fused_attn_block_pooled_spmd(x, ln_s, ln_b, wqkv, bqkv, wo, bo,
                                 heads, n_valid, pool_row, causal):
    return fused_attn_block_pooled(x, ln_s, ln_b, wqkv, bqkv, wo, bo,
                                   heads=heads, n_valid=n_valid,
                                   pool_row=pool_row, causal=causal)


def _pooled_infer(*args):
    arg_shapes = args[-2]
    spec = getattr(arg_shapes[0].sharding, "spec", None)
    batch = spec[0] if spec is not None and len(spec) > 0 else None
    return NamedSharding(arg_shapes[0].sharding.mesh, P(batch, None))


def _pooled_partition(*args):
    statics = args[:-3]
    mesh, arg_shapes, _result_shape = args[-3:]
    spec = getattr(arg_shapes[0].sharding, "spec", None)
    batch = spec[0] if spec is not None and len(spec) > 0 else None
    xsh = NamedSharding(mesh, P(batch, None, None))
    osh = NamedSharding(mesh, P(batch, None))
    arg_shardings = (xsh,) + tuple(
        _replicated_like(mesh, a) for a in arg_shapes[1:]
    )
    names = ("heads", "n_valid", "pool_row", "causal")

    def lower_fn(x, *weights):
        return fused_attn_block_pooled(
            x, *weights, **dict(zip(names, statics))
        )

    return mesh, lower_fn, osh, arg_shardings


fused_attn_block_pooled_spmd.def_partition(
    infer_sharding_from_operands=_pooled_infer,
    partition=_pooled_partition,
    sharding_rule="b s d, e, f, g h, i, j k, l -> b d",
)


@functools.partial(custom_partitioning, static_argnums=(8, 9, 10))
def fused_attn_block_pooled_dyn_spmd(x, rows, ln_s, ln_b, wqkv, bqkv, wo,
                                     bo, heads, n_valid, causal):
    return fused_attn_block_pooled_dyn(x, rows, ln_s, ln_b, wqkv, bqkv,
                                       wo, bo, heads=heads,
                                       n_valid=n_valid, causal=causal)


def _pooled_dyn_partition(*args):
    statics = args[:-3]
    mesh, arg_shapes, _result_shape = args[-3:]
    spec = getattr(arg_shapes[0].sharding, "spec", None)
    batch = spec[0] if spec is not None and len(spec) > 0 else None
    xsh = NamedSharding(mesh, P(batch, None, None))
    rsh = NamedSharding(mesh, P(batch))
    osh = NamedSharding(mesh, P(batch, None))
    arg_shardings = (xsh, rsh) + tuple(
        _replicated_like(mesh, a) for a in arg_shapes[2:]
    )
    names = ("heads", "n_valid", "causal")

    def lower_fn(x, rows, *weights):
        return fused_attn_block_pooled_dyn(
            x, rows, *weights, **dict(zip(names, statics))
        )

    return mesh, lower_fn, osh, arg_shardings


fused_attn_block_pooled_dyn_spmd.def_partition(
    infer_sharding_from_operands=_pooled_infer,
    partition=_pooled_dyn_partition,
    sharding_rule="b s d, b, e, f, g h, i, j k, l -> b d",
)


@functools.partial(custom_partitioning, static_argnums=(7,))
def fused_mlp_block_spmd(x, ln_s, ln_b, wfc, bfc, wproj, bproj, act):
    return fused_mlp_block(x, ln_s, ln_b, wfc, bfc, wproj, bproj, act=act)


fused_mlp_block_spmd.def_partition(
    infer_sharding_from_operands=_block_infer,
    partition=_make_block_partition(
        lambda x, ln_s, ln_b, wfc, bfc, wproj, bproj, **kw: fused_mlp_block(
            x, ln_s, ln_b, wfc, bfc, wproj, bproj, **kw
        ),
        ("act",),
    ),
    sharding_rule="b s d, e, f, g h, i, j k, l -> b s d",
)


# ---------------------------------------------------------------------------
# fallback MLP pair: fc+gelu and proj+residual as two kernels. Used if the
# single fused_mlp_block's ~9.4 MB resident weights don't fit the scoped
# VMEM on hardware: each kernel holds one 4.7 MB weight, at the cost of
# one HBM round trip of the (B, SP, 4D) intermediate (~0.4 ms/layer at
# ViT-B/32 step shapes). scripts/bench_block_kernels.py probes both.
# ---------------------------------------------------------------------------


def _fc_kernel(x_ref, ln_ref, wfc_ref, bfc_ref, h_ref, *rest, act: str,
               flat: bool = False):
    # trailing refs: [hpre_out (training residual — the PRE-gelu fc
    # output rounded to the activation dtype; see fused_mlp_split_res)]
    hpre_out = rest[0] if rest else None
    x = x_ref[:]
    g, sp, d = x.shape
    ff = wfc_ref.shape[1]
    y = _ln_f32(
        x.astype(jnp.float32), ln_ref[0, :], ln_ref[1, :]
    ).astype(x.dtype)
    if flat:
        y = y.reshape(g * sp, d)
    dims = (((1,), (0,)), ((), ())) if flat else (((2,), (0,)), ((), ()))
    h = jax.lax.dot_general(
        y, wfc_ref[:], dimension_numbers=dims,
        preferred_element_type=jnp.float32,
    )
    h = h + bfc_ref[0, :]
    if hpre_out is not None:
        # weight-dtype residual — see _attn_block_kernel's qkv_out note
        hpre_out[:] = (h.reshape(g, sp, ff) if flat else h).astype(
            hpre_out.dtype)
    h = _gelu_f32(h, act)
    h_ref[:] = h.reshape(g, sp, ff).astype(x.dtype) if flat else h.astype(
        x.dtype
    )


def _proj_kernel(x_ref, h_ref, wproj_ref, bproj_ref, o_ref,
                 *, flat: bool = False):
    x = x_ref[:]
    g, sp, d = x.shape
    h = h_ref[:]
    if flat:
        h = h.reshape(g * sp, h.shape[2])
    dims = (((1,), (0,)), ((), ())) if flat else (((2,), (0,)), ((), ()))
    out = jax.lax.dot_general(
        h, wproj_ref[:], dimension_numbers=dims,
        preferred_element_type=jnp.float32,
    )
    if flat:
        out = out.reshape(g, sp, d)
    o_ref[:] = x + (out + bproj_ref[0, :]).astype(x.dtype)


def _mlp_split_group(batch: int, seq_pad: int, width: int,
                     res: bool = False):
    """Calibrated entries obey the _TRAIN_RES_VALIDATED rule — see
    _attn_group."""

    def est(g):
        blk = g * seq_pad * width
        return (
            4 * width * width * 2       # one weight matrix per kernel
            + 2 * 2 * blk * 2           # x/out or x/h blocks
            + 2 * 4 * blk * 2           # h blocks bf16 (in+out worst case)
            + blk * 4 + 4 * blk * 4     # f32 temps
            # saved-activation training: the fc kernel streams a SECOND
            # (G, SP, FF) output (pre-gelu residual) — see _attn_group
            + (2 * 4 * blk * 2 if res else 0)
        )

    cal = _CALIBRATED_MLP.get((seq_pad, width))
    if (cal is not None and cal[0] in ("split", "splitflat")
            and batch % cal[1] == 0):
        if (not res or (seq_pad, width) in _TRAIN_RES_VALIDATED
                or est(cal[1]) <= _VMEM_BUDGET):
            return cal[1]
    for g in (8, 4, 2, 1):
        if batch % g:
            continue
        if est(g) <= _VMEM_BUDGET:
            return g
    return None


@functools.partial(
    jax.jit, static_argnames=("act", "interpret", "group", "flat")
)
def fused_mlp_split(
    x: jax.Array, ln_scale: jax.Array, ln_bias: jax.Array,
    wfc: jax.Array, bfc: jax.Array, wproj: jax.Array, bproj: jax.Array,
    act: str = "gelu", interpret: bool = False, group: int | None = None,
    flat: bool | None = None,
) -> jax.Array:
    """Same contract as fused_mlp_block, two-kernel variant."""
    b, sp, d = x.shape
    ff = wfc.shape[1]
    group = group or _mlp_split_group(b, sp, d)
    if flat is None:
        cal = _CALIBRATED_MLP.get((sp, d))
        flat = cal is not None and cal == ("splitflat", group)
    assert group is not None
    xspec = pl.BlockSpec((group, sp, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    hspec = pl.BlockSpec((group, sp, ff), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    ln = jnp.stack([ln_scale, ln_bias]).astype(jnp.float32)
    params = pltpu.CompilerParams(
        dimension_semantics=("arbitrary",),
        vmem_limit_bytes=_VMEM_LIMIT_BYTES,
    )
    h = pl.pallas_call(
        functools.partial(_fc_kernel, act=act, flat=flat),
        grid=(b // group,),
        in_specs=[xspec, const((2, d)), const((d, ff)), const((1, ff))],
        out_specs=hspec,
        out_shape=jax.ShapeDtypeStruct((b, sp, ff), x.dtype),
        interpret=interpret,
        compiler_params=params,
    )(x, ln, wfc, bfc.reshape(1, -1))
    return pl.pallas_call(
        functools.partial(_proj_kernel, flat=flat),
        grid=(b // group,),
        in_specs=[xspec, hspec, const((ff, d)), const((1, d))],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct((b, sp, d), x.dtype),
        interpret=interpret,
        compiler_params=params,
    )(x, h, wproj, bproj.reshape(1, -1))


# ---------------------------------------------------------------------------
# padded-head attention path for head_dim 72/80/88/104 towers. ViT-H/14 —
# the reference's DEFAULT extract-features backbone
# (reference extract-features.py:195-207, xlm-roberta-large-ViT-H-14) — has
# head_dim 80: per-head lane slices land at 80-byte offsets, which Mosaic
# relayouts (round-2 measured the monolithic kernel 38% slower end-to-end).
# Remedy: pad each head slot to 128 lanes IN THE WEIGHTS (done on the
# weight tensors at trace time, never on the activation stream):
#
#   q = LN1(x) @ wq_pad        (wq_pad (D, H*128), zero cols beyond hd)
#   k, v likewise              (zero-padded K cols contribute 0 logits;
#                               zero-padded V cols emit zero att cols)
#   att = fused_short_attention(q, k, v)   (128-aligned head slices,
#                               scale=1/sqrt(TRUE hd) passed explicitly)
#   x = x + att @ wo_pad + bo  (wo_pad (H*128, D), zero ROWS at padding)
#
# Five Pallas calls + the split-MLP pair keep the layer all-custom-call,
# so the XLA<->Pallas relayout tax (BENCHMARKS.md round-3 section) never
# appears. Cost: the four attention-side GEMMs run at 128/hd times their
# natural flops (1.6x for ViT-H).
#
# PROBE VERDICT (round 3, ViT-H shapes B=128 SP=264 D=1280): the padded
# decomposition measured 5.04 ms vs the MONOLITHIC fused_attn_block's
# 3.41 ms — Mosaic compiles the 80-wide in-kernel lane slices without
# the feared relayouts, so the pad's 1.6x GEMM overhead never pays for
# itself and ViT-H production uses the monolithic kernel via
# _CALIBRATED_ATTN. This path is kept as a calibratable fallback for
# shapes where unaligned slices DO blow up (populate _CALIBRATED_PAD
# from a probe run to enable it; nothing enables it today).
#
# KNOWN INEFFICIENCY baked into that 5.04 ms: the three q/k/v
# fused_ln_matmul calls each re-read the (B, SP, D) block and re-run the
# f32 LN (3x LN work + 3x activation reads vs the monolithic kernel's 1x).
# Fixing it needs a packed-qkv fused_short_attention variant (one
# (D, 3*H*128) GEMM, in-kernel q/k/v slots) — an XLA split between the
# kernels would reintroduce the boundary copies this path exists to avoid.
# Worth building only if a probe ever finds a shape where this path wins
# DESPITE the triple-LN handicap.
# ---------------------------------------------------------------------------

#: (seq_pad, width) -> (proj_group, resid_group); populated from hardware
#: probes (scripts/bench_block_kernels.py --padded).
_CALIBRATED_PAD: dict = {}


@functools.partial(
    jax.jit, static_argnames=("act", "interpret", "group")
)
def fused_ln_matmul(
    x: jax.Array, ln_scale: jax.Array, ln_bias: jax.Array,
    w: jax.Array, b: jax.Array, act: str = "none",
    interpret: bool = False, group: int = 1,
) -> jax.Array:
    """x (B, SP, D) bf16 -> act(LN(x) @ w + b) (B, SP, OW). The weight
    rides resident in VMEM (constant-index block); OW is arbitrary."""
    bt, sp, d = x.shape
    ow = w.shape[1]
    xspec = pl.BlockSpec((group, sp, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((group, sp, ow), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    ln = jnp.stack([ln_scale, ln_bias]).astype(jnp.float32)
    return pl.pallas_call(
        functools.partial(_fc_kernel, act=act),
        grid=(bt // group,),
        in_specs=[xspec, const((2, d)), const((d, ow)), const((1, ow))],
        out_specs=ospec,
        out_shape=jax.ShapeDtypeStruct((bt, sp, ow), x.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT_BYTES,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * bt * sp * d * ow,
            bytes_accessed=bt * sp * (d + ow) * 2 + d * ow * 2,
            transcendentals=0,
        ),
    )(x, ln, w, b.reshape(1, -1))


@functools.partial(jax.jit, static_argnames=("interpret", "group"))
def fused_residual_matmul(
    x: jax.Array, h: jax.Array, w: jax.Array, b: jax.Array,
    interpret: bool = False, group: int = 1,
) -> jax.Array:
    """x (B, SP, D), h (B, SP, IW) -> x + h @ w + b (residual GEMM)."""
    bt, sp, d = x.shape
    iw = h.shape[2]
    xspec = pl.BlockSpec((group, sp, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    hspec = pl.BlockSpec((group, sp, iw), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        _proj_kernel,
        grid=(bt // group,),
        in_specs=[xspec, hspec, const((iw, d)), const((1, d))],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct((bt, sp, d), x.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT_BYTES,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * bt * sp * iw * d,
            bytes_accessed=bt * sp * (2 * d + iw) * 2 + iw * d * 2,
            transcendentals=0,
        ),
    )(x, h, w, b.reshape(1, -1))


def _pad_head_weights(wqkv, bqkv, wo, heads: int, hd: int, hp: int):
    """Zero-pad per-head slots to hp lanes. All ops act on WEIGHT tensors
    (cheap, off the activation stream; XLA hoists/fuses them)."""
    d = wqkv.shape[0]

    def slot(i):
        w = wqkv[:, i * d:(i + 1) * d].reshape(d, heads, hd)
        w = jnp.pad(w, ((0, 0), (0, 0), (0, hp - hd)))
        bb = bqkv[i * d:(i + 1) * d].reshape(heads, hd)
        bb = jnp.pad(bb, ((0, 0), (0, hp - hd)))
        return w.reshape(d, heads * hp), bb.reshape(heads * hp)

    (wq, bq), (wk, bk), (wv, bv) = slot(0), slot(1), slot(2)
    wo_pad = jnp.pad(
        wo.reshape(heads, hd, d), ((0, 0), (0, hp - hd), (0, 0))
    ).reshape(heads * hp, d)
    return (wq, bq), (wk, bk), (wv, bv), wo_pad


def supports_fused_block_padded(batch: int, seq_pad: int, width: int,
                                heads: int, dtype) -> bool:
    """Gate for the padded-head all-kernel path: hardware-calibrated
    (seq_pad, width) shapes only — the padded decomposition was built for
    head dims that are NOT lane-aligned (72/80/88/104), and enabling it
    means the MLP must also run as kernels (mlp_choice), or the layer
    reintroduces the boundary relayouts the path exists to avoid."""
    if (seq_pad, width) not in _CALIBRATED_PAD:
        return False
    from .attention import _pick_group

    pg, rg = _CALIBRATED_PAD[(seq_pad, width)]
    return (
        jnp.dtype(dtype) == jnp.bfloat16
        and width % heads == 0
        and (width // heads) < 128
        and (width // heads) % 64 != 0
        and seq_pad % 8 == 0
        and batch % pg == 0 and batch % rg == 0
        and mlp_choice(batch, seq_pad, width) is not None
        # the inner fused_short_attention runs on the PADDED width
        # (heads * 128 lanes); a calibrated entry whose padded working set
        # can't tile VMEM must fall back to XLA, not crash at trace
        and _pick_group(batch, seq_pad, heads * 128) is not None
        and jax.default_backend() == "tpu"
    )


def fused_attn_block_padded(
    x: jax.Array, ln_scale: jax.Array, ln_bias: jax.Array,
    wqkv: jax.Array, bqkv: jax.Array, wo: jax.Array, bo: jax.Array,
    heads: int, n_valid: int, causal: bool = False,
    interpret: bool = False, groups: tuple | None = None,
) -> jax.Array:
    """Same contract as fused_attn_block, for non-lane-aligned head dims.
    ``groups`` = (proj_group, resid_group) overrides the calibration
    (probe use)."""
    from .attention import fused_short_attention

    b, sp, d = x.shape
    hd = d // heads
    hp = 128
    pg, rg = groups or _CALIBRATED_PAD.get((sp, d), (1, 1))
    (wq, bq), (wk, bk), (wv, bv), wo_pad = _pad_head_weights(
        wqkv, bqkv, wo, heads, hd, hp
    )
    q = fused_ln_matmul(x, ln_scale, ln_bias, wq, bq,
                        group=pg, interpret=interpret)
    k = fused_ln_matmul(x, ln_scale, ln_bias, wk, bk,
                        group=pg, interpret=interpret)
    v = fused_ln_matmul(x, ln_scale, ln_bias, wv, bv,
                        group=pg, interpret=interpret)
    att = fused_short_attention(
        q, k, v, heads=heads, n_valid=n_valid, causal=causal,
        scale=float(1.0 / np.sqrt(hd)), interpret=interpret,
    )
    return fused_residual_matmul(x, att, wo_pad, bo,
                                 group=rg, interpret=interpret)


@functools.partial(custom_partitioning, static_argnums=(7, 8, 9))
def fused_attn_block_padded_spmd(x, ln_s, ln_b, wqkv, bqkv, wo, bo,
                                 heads, n_valid, causal):
    return fused_attn_block_padded(x, ln_s, ln_b, wqkv, bqkv, wo, bo,
                                   heads=heads, n_valid=n_valid,
                                   causal=causal)


fused_attn_block_padded_spmd.def_partition(
    infer_sharding_from_operands=_block_infer,
    partition=_make_block_partition(
        lambda x, ln_s, ln_b, wqkv, bqkv, wo, bo, **kw:
        fused_attn_block_padded(x, ln_s, ln_b, wqkv, bqkv, wo, bo, **kw),
        ("heads", "n_valid", "causal"),
    ),
    sharding_rule="b s d, e, f, g h, i, j k, l -> b s d",
)


@functools.partial(custom_partitioning, static_argnums=(7,))
def fused_mlp_split_spmd(x, ln_s, ln_b, wfc, bfc, wproj, bproj, act):
    return fused_mlp_split(x, ln_s, ln_b, wfc, bfc, wproj, bproj, act=act)


fused_mlp_split_spmd.def_partition(
    infer_sharding_from_operands=_block_infer,
    partition=_make_block_partition(
        lambda x, ln_s, ln_b, wfc, bfc, wproj, bproj, **kw: fused_mlp_split(
            x, ln_s, ln_b, wfc, bfc, wproj, bproj, **kw
        ),
        ("act",),
    ),
    sharding_rule="b s d, e, f, g h, i, j k, l -> b s d",
)


# ---------------------------------------------------------------------------
# trainable wrappers: custom-VJP versions of every spmd entry point above.
#
# custom_partitioning carries no autodiff rule, so a train step over a
# tower with fused_block=True (the production default) would fail to trace
# under jax.grad. These wrappers make the fast path trainable the remat
# way: the FORWARD runs the Pallas kernel (through its custom_partitioning
# wrapper, so the GSPMD batch rule still applies per-shard), and the
# BACKWARD recomputes the block through a plain-ops reference of the same
# math and differentiates that with jax.vjp. The backward graph is then
# pure XLA — it has no kernel<->XLA layout boundaries of its own (the very
# tax the all-kernel forward removes, BENCHMARKS.md round 3) and GSPMD
# shards it by the batch axis like any jnp code. Cost: one reference
# forward per block in the backward pass — the standard recompute price,
# identical to what `remat` pays.
#
# The plain references mirror the kernels' numerics (f32 LayerNorm and
# softmax, GEMMs in the weight dtype, residual add in the stream dtype) so
# the gradients correspond to the same function the kernel computes up to
# bf16 rounding-point placement. Outside differentiation the wrappers are
# free: JAX calls the primal directly, producing the identical forward
# graph as the raw spmd entry points.
# ---------------------------------------------------------------------------


def plain_attn_block(x, ln_s, ln_b, wqkv, bqkv, wo, bo, *, heads: int,
                     n_valid: int, causal: bool):
    """Plain-ops reference of fused_attn_block: x + out_proj(MHA(LN1(x))).
    GEMMs run in the weight dtype (bf16 in production), softmax in f32 —
    the same ordering the kernel uses (_attn_block_kernel)."""
    b, sp, d = x.shape
    hd = d // heads
    dt = wqkv.dtype
    y = _ln_f32(x.astype(jnp.float32), ln_s, ln_b).astype(dt)
    qkv = y @ wqkv + bqkv
    q, k, v = jnp.split(qkv, 3, axis=-1)
    qh = q.reshape(b, sp, heads, hd)
    kh = k.reshape(b, sp, heads, hd)
    vh = v.reshape(b, sp, heads, hd)
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", qh.astype(jnp.float32), kh.astype(jnp.float32)
    ) * np.float32(1.0 / np.sqrt(hd))
    col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, sp), 3)
    keep = col < n_valid
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, (1, 1, sp, sp), 2)
        keep = keep & (col <= row)
    logits = jnp.where(keep, logits, -jnp.inf)
    p = jax.nn.softmax(logits, axis=-1).astype(dt)
    att = jnp.einsum("bhqk,bkhd->bqhd", p, vh).reshape(b, sp, d)
    return x + (att @ wo + bo).astype(x.dtype)


def plain_mlp_block(x, ln_s, ln_b, wfc, bfc, wproj, bproj, *, act: str):
    """Plain-ops reference of fused_mlp_block / fused_mlp_split:
    x + proj(gelu(fc(LN2(x))))."""
    dt = wfc.dtype
    y = _ln_f32(x.astype(jnp.float32), ln_s, ln_b).astype(dt)
    h = y @ wfc + bfc
    h = _gelu_f32(h.astype(jnp.float32), act).astype(dt)
    return x + (h @ wproj + bproj).astype(x.dtype)


def _recompute_bwd(reference, n_valid_arg=None):
    """bwd rule: differentiate ``reference`` at the saved primals (all of
    which are differentiable tensors) and pull the cotangent back.

    ``n_valid_arg`` (index into the nondiff args) enforces the padded-row
    contract: the kernel FORWARD leaves output rows >= n_valid as garbage,
    while ``reference`` computes defined values there — the two only agree
    when the cotangent at those rows is zero. Every current consumer
    guarantees that (they never read padded rows), but a future consumer
    that did would otherwise silently get gradients inconsistent with the
    actual forward values, so the bwd zeroes those rows explicitly."""

    def bwd(*args):
        res, g = args[-2], args[-1]
        nondiff = args[:-2]
        if n_valid_arg is not None:
            n_valid = nondiff[n_valid_arg]
            row = jax.lax.broadcasted_iota(jnp.int32, g.shape, 1)
            g = jnp.where(row < n_valid, g, jnp.zeros((), g.dtype))
        fn = functools.partial(reference, *nondiff)
        _, vjp = jax.vjp(lambda *ts: fn(*ts), *res)
        return vjp(g)

    return bwd


# --- saved-activation forward variants: the SAME kernels, additionally
# emitting the cut-point residual (attn: the bf16 post-bias qkv; MLP: the
# bf16 pre-gelu fc output). The _train wrappers' backward then consumes the
# residual instead of recomputing the whole plain forward — the recompute
# tax that made training with kernels 0.90x of XLA (round-3 A/B) was
# dominated by re-running the qkv/fc GEMMs, which are exactly what the
# residual skips. Inference never calls these (no extra HBM writes there).


def fused_attn_block_res(
    x, ln_scale, ln_bias, wqkv, bqkv, wo, bo, heads: int, n_valid: int,
    causal: bool = False, interpret: bool = False, group: int | None = None,
    flat: bool | None = None,
):
    """fused_attn_block + the (B, SP, 3D) bf16 qkv residual."""
    b, sp, d = x.shape
    group = group or _attn_group(b, sp, d, res=True)
    if flat is None:
        flat = _CALIBRATED_FLAT_ATTN.get((sp, d)) == group
    assert group is not None, "gate with supports_fused_block() first"
    xspec = pl.BlockSpec((group, sp, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    qspec = pl.BlockSpec((group, sp, 3 * d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    ln = jnp.stack([ln_scale, ln_bias]).astype(jnp.float32)
    return pl.pallas_call(
        functools.partial(
            _attn_block_kernel, heads=heads, n_valid=n_valid,
            scale=1.0 / np.sqrt(d // heads), causal=causal, flat=flat,
        ),
        grid=(b // group,),
        in_specs=[
            xspec,
            const((2, d)),
            const((d, 3 * d)),
            const((1, 3 * d)),
            const((d, d)),
            const((1, d)),
        ],
        out_specs=(xspec, qspec),
        out_shape=(
            jax.ShapeDtypeStruct((b, sp, d), x.dtype),
            # weight-dtype residual (bf16 even under the f32 stream) —
            # see _attn_block_kernel's qkv_out note
            jax.ShapeDtypeStruct((b, sp, 3 * d), wqkv.dtype),
        ),
        scratch_shapes=[pltpu.VMEM((group, sp, d), x.dtype)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT_BYTES,
        ),
    )(x, ln, wqkv, bqkv.reshape(1, -1), wo, bo.reshape(1, -1))


def fused_mlp_block_res(
    x, ln_scale, ln_bias, wfc, bfc, wproj, bproj, act: str = "gelu",
    interpret: bool = False, group: int | None = None,
    flat: bool | None = None,
):
    """fused_mlp_block + the (B, SP, FF) bf16 pre-gelu residual."""
    b, sp, d = x.shape
    ff = wfc.shape[1]
    group = group or _mlp_group(b, sp, d, res=True)
    if flat is None:
        cal = _CALIBRATED_MLP.get((sp, d))
        flat = cal is not None and cal == ("singleflat", group)
    assert group is not None, "gate with supports_fused_block() first"
    xspec = pl.BlockSpec((group, sp, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    hspec = pl.BlockSpec((group, sp, ff), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    ln = jnp.stack([ln_scale, ln_bias]).astype(jnp.float32)
    return pl.pallas_call(
        functools.partial(_mlp_block_kernel, act=act, flat=flat),
        grid=(b // group,),
        in_specs=[
            xspec,
            const((2, d)),
            const((d, ff)),
            const((1, ff)),
            const((ff, d)),
            const((1, d)),
        ],
        out_specs=(xspec, hspec),
        out_shape=(
            jax.ShapeDtypeStruct((b, sp, d), x.dtype),
            # weight-dtype residual — see _attn_block_kernel's qkv_out note
            jax.ShapeDtypeStruct((b, sp, ff), wfc.dtype),
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT_BYTES,
        ),
    )(x, ln, wfc, bfc.reshape(1, -1), wproj, bproj.reshape(1, -1))


def fused_mlp_split_res(
    x, ln_scale, ln_bias, wfc, bfc, wproj, bproj, act: str = "gelu",
    interpret: bool = False, group: int | None = None,
    flat: bool | None = None,
):
    """fused_mlp_split + the (B, SP, FF) bf16 pre-gelu residual (the
    two-kernel variant for widths whose weight pair exceeds VMEM — the
    fc kernel writes the pre-gelu h alongside its post-gelu output)."""
    b, sp, d = x.shape
    ff = wfc.shape[1]
    group = group or _mlp_split_group(b, sp, d, res=True)
    if flat is None:
        cal = _CALIBRATED_MLP.get((sp, d))
        flat = cal is not None and cal == ("splitflat", group)
    assert group is not None
    xspec = pl.BlockSpec((group, sp, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    hspec = pl.BlockSpec((group, sp, ff), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    ln = jnp.stack([ln_scale, ln_bias]).astype(jnp.float32)
    params = pltpu.CompilerParams(
        dimension_semantics=("arbitrary",),
        vmem_limit_bytes=_VMEM_LIMIT_BYTES,
    )
    h, h_pre = pl.pallas_call(
        functools.partial(_fc_kernel, act=act, flat=flat),
        grid=(b // group,),
        in_specs=[xspec, const((2, d)), const((d, ff)), const((1, ff))],
        out_specs=(hspec, hspec),
        out_shape=(
            jax.ShapeDtypeStruct((b, sp, ff), x.dtype),
            # weight-dtype residual — see _attn_block_kernel's qkv_out note
            jax.ShapeDtypeStruct((b, sp, ff), wfc.dtype),
        ),
        interpret=interpret,
        compiler_params=params,
    )(x, ln, wfc, bfc.reshape(1, -1))
    out = pl.pallas_call(
        functools.partial(_proj_kernel, flat=flat),
        grid=(b // group,),
        in_specs=[xspec, hspec, const((ff, d)), const((1, d))],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct((b, sp, d), x.dtype),
        interpret=interpret,
        compiler_params=params,
    )(x, h, wproj, bproj.reshape(1, -1))
    return out, h_pre


@functools.partial(custom_partitioning, static_argnums=(7, 8, 9))
def fused_attn_block_res_spmd(x, ln_s, ln_b, wqkv, bqkv, wo, bo,
                              heads, n_valid, causal):
    return fused_attn_block_res(x, ln_s, ln_b, wqkv, bqkv, wo, bo,
                                heads=heads, n_valid=n_valid, causal=causal)


def _res_infer(*args):
    arg_shapes = args[-2]
    xsh = _x_batch_only(arg_shapes[0].sharding)
    return (xsh, xsh)


def _make_res_partition(impl, static_names):
    def partition(*args):
        statics = args[:-3]
        mesh, arg_shapes, _result_shape = args[-3:]
        xsh = _x_batch_only(arg_shapes[0].sharding)
        arg_shardings = (xsh,) + tuple(
            _replicated_like(mesh, a) for a in arg_shapes[1:]
        )

        def lower_fn(x, *weights):
            return impl(x, *weights, **dict(zip(static_names, statics)))

        return mesh, lower_fn, (xsh, xsh), arg_shardings

    return partition


fused_attn_block_res_spmd.def_partition(
    infer_sharding_from_operands=_res_infer,
    partition=_make_res_partition(
        lambda x, ln_s, ln_b, wqkv, bqkv, wo, bo, **kw: fused_attn_block_res(
            x, ln_s, ln_b, wqkv, bqkv, wo, bo, **kw
        ),
        ("heads", "n_valid", "causal"),
    ),
    sharding_rule="b s d, e, f, g h, i, j k, l -> b s d, b s m",
)


@functools.partial(custom_partitioning, static_argnums=(7,))
def fused_mlp_block_res_spmd(x, ln_s, ln_b, wfc, bfc, wproj, bproj, act):
    return fused_mlp_block_res(x, ln_s, ln_b, wfc, bfc, wproj, bproj,
                               act=act)


fused_mlp_block_res_spmd.def_partition(
    infer_sharding_from_operands=_res_infer,
    partition=_make_res_partition(
        lambda x, ln_s, ln_b, wfc, bfc, wproj, bproj, **kw:
        fused_mlp_block_res(x, ln_s, ln_b, wfc, bfc, wproj, bproj, **kw),
        ("act",),
    ),
    sharding_rule="b s d, e, f, g h, i, j k, l -> b s d, b s m",
)


@functools.partial(custom_partitioning, static_argnums=(7,))
def fused_mlp_split_res_spmd(x, ln_s, ln_b, wfc, bfc, wproj, bproj, act):
    return fused_mlp_split_res(x, ln_s, ln_b, wfc, bfc, wproj, bproj,
                               act=act)


fused_mlp_split_res_spmd.def_partition(
    infer_sharding_from_operands=_res_infer,
    partition=_make_res_partition(
        lambda x, ln_s, ln_b, wfc, bfc, wproj, bproj, **kw:
        fused_mlp_split_res(x, ln_s, ln_b, wfc, bfc, wproj, bproj, **kw),
        ("act",),
    ),
    sharding_rule="b s d, e, f, g h, i, j k, l -> b s d, b s m",
)


# --- cut-point stage functions (plain ops, numerics mirroring
# plain_attn_block / plain_mlp_block around the saved residual)


def _qkv_stage(x, ln_s, ln_b, wqkv, bqkv):
    y = _ln_f32(x.astype(jnp.float32), ln_s, ln_b).astype(wqkv.dtype)
    return y @ wqkv + bqkv


def _attn_from_qkv(x, qkv, wo, bo, heads, n_valid, causal):
    b, sp, d = x.shape
    hd = d // heads
    q, k, v = jnp.split(qkv, 3, axis=-1)
    qh = q.reshape(b, sp, heads, hd)
    kh = k.reshape(b, sp, heads, hd)
    vh = v.reshape(b, sp, heads, hd)
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", qh.astype(jnp.float32), kh.astype(jnp.float32)
    ) * np.float32(1.0 / np.sqrt(hd))
    col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, sp), 3)
    keep = col < n_valid
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, (1, 1, sp, sp), 2)
        keep = keep & (col <= row)
    logits = jnp.where(keep, logits, -jnp.inf)
    p = jax.nn.softmax(logits, axis=-1).astype(qkv.dtype)
    att = jnp.einsum("bhqk,bkhd->bqhd", p, vh).reshape(b, sp, d)
    return x + (att @ wo + bo).astype(x.dtype)


def _fc_stage(x, ln_s, ln_b, wfc, bfc):
    y = _ln_f32(x.astype(jnp.float32), ln_s, ln_b).astype(wfc.dtype)
    return y @ wfc + bfc


def _mlp_from_h(x, h, wproj, bproj, act):
    hh = _gelu_f32(h.astype(jnp.float32), act).astype(h.dtype)
    return x + (hh @ wproj + bproj).astype(x.dtype)


def _attn_saved_bwd(heads, n_valid, causal, res, g):
    """Backward from the saved qkv residual: stage B (attention + out proj
    + residual) differentiates from qkv; stage A's vjp needs only y = LN(x)
    and wqkv — its primal qkv GEMM output is unused and DCE'd by XLA, so
    the expensive recompute the plain-vjp backward paid is gone. Cotangents
    at padded rows (>= n_valid) are zeroed per the kernel-forward
    contract (see _recompute_bwd). A ``None`` residual means the forward
    could not afford the extra VMEM output (res-aware _attn_group
    rejected every group) and ran the plain kernel — fall back to the
    round-3 recompute pullback."""
    x, qkv, ln_s, ln_b, wqkv, bqkv, wo, bo = res
    row = jax.lax.broadcasted_iota(jnp.int32, g.shape, 1)
    g = jnp.where(row < n_valid, g, jnp.zeros((), g.dtype))
    if qkv is None:
        _, vjp = jax.vjp(
            lambda *ts: plain_attn_block(
                *ts, heads=heads, n_valid=n_valid, causal=causal),
            x, ln_s, ln_b, wqkv, bqkv, wo, bo,
        )
        return vjp(g)
    _, vjp_b = jax.vjp(
        lambda x_, qkv_, wo_, bo_: _attn_from_qkv(
            x_, qkv_, wo_, bo_, heads, n_valid, causal),
        x, qkv, wo, bo,
    )
    gx1, g_qkv, g_wo, g_bo = vjp_b(g)
    _, vjp_a = jax.vjp(_qkv_stage, x, ln_s, ln_b, wqkv, bqkv)
    # the residual is saved at the WEIGHT dtype (see the kernel's qkv_out
    # note), so this cast is normally a no-op; it stays as a guard so the
    # stage-A pullback always receives a cotangent matching _qkv_stage's
    # output dtype (bf16-rounding-level looseness either way)
    g_qkv = g_qkv.astype(jnp.result_type(wqkv.dtype, bqkv.dtype))
    gx2, g_ls, g_lb, g_wqkv, g_bqkv = vjp_a(g_qkv)
    return gx1 + gx2, g_ls, g_lb, g_wqkv, g_bqkv, g_wo, g_bo


def _mlp_saved_bwd(act, res, g):
    x, h, ln_s, ln_b, wfc, bfc, wproj, bproj = res
    if h is None:  # VMEM-rejected residual — recompute fallback (see attn)
        _, vjp = jax.vjp(
            lambda *ts: plain_mlp_block(*ts, act=act),
            x, ln_s, ln_b, wfc, bfc, wproj, bproj,
        )
        return vjp(g)
    _, vjp_b = jax.vjp(
        lambda x_, h_, wproj_, bproj_: _mlp_from_h(
            x_, h_, wproj_, bproj_, act),
        x, h, wproj, bproj,
    )
    gx1, g_h, g_wproj, g_bproj = vjp_b(g)
    _, vjp_a = jax.vjp(_fc_stage, x, ln_s, ln_b, wfc, bfc)
    g_h = g_h.astype(jnp.result_type(wfc.dtype, bfc.dtype))  # see attn bwd
    gx2, g_ls, g_lb, g_wfc, g_bfc = vjp_a(g_h)
    return gx1 + gx2, g_ls, g_lb, g_wfc, g_bfc, g_wproj, g_bproj


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def fused_attn_block_train(x, ln_s, ln_b, wqkv, bqkv, wo, bo,
                           heads, n_valid, causal):
    return fused_attn_block_spmd(x, ln_s, ln_b, wqkv, bqkv, wo, bo,
                                 heads, n_valid, causal)


def _attn_train_fwd(x, ln_s, ln_b, wqkv, bqkv, wo, bo,
                    heads, n_valid, causal):
    b, sp, d = x.shape
    if _attn_group(b, sp, d, res=True) is None:
        # the extra qkv output doesn't fit VMEM at any group for this
        # (uncalibrated) shape: run the plain kernel forward and let the
        # backward take the recompute path (residual None)
        out = fused_attn_block_spmd(x, ln_s, ln_b, wqkv, bqkv, wo, bo,
                                    heads, n_valid, causal)
        return out, (x, None, ln_s, ln_b, wqkv, bqkv, wo, bo)
    out, qkv = fused_attn_block_res_spmd(x, ln_s, ln_b, wqkv, bqkv, wo, bo,
                                         heads, n_valid, causal)
    return out, (x, qkv, ln_s, ln_b, wqkv, bqkv, wo, bo)


fused_attn_block_train.defvjp(_attn_train_fwd, _attn_saved_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def fused_attn_block_padded_train(x, ln_s, ln_b, wqkv, bqkv, wo, bo,
                                  heads, n_valid, causal):
    return fused_attn_block_padded_spmd(x, ln_s, ln_b, wqkv, bqkv, wo, bo,
                                        heads, n_valid, causal)


fused_attn_block_padded_train.defvjp(
    lambda x, ln_s, ln_b, wqkv, bqkv, wo, bo, heads, n_valid, causal: (
        fused_attn_block_padded_spmd(x, ln_s, ln_b, wqkv, bqkv, wo, bo,
                                     heads, n_valid, causal),
        (x, ln_s, ln_b, wqkv, bqkv, wo, bo),
    ),
    # the padded-head decomposition is an implementation detail; its
    # semantics are exactly plain_attn_block's
    _recompute_bwd(
        lambda heads, n_valid, causal, *ts: plain_attn_block(
            *ts, heads=heads, n_valid=n_valid, causal=causal),
        n_valid_arg=1,
    ),
)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def fused_mlp_block_train(x, ln_s, ln_b, wfc, bfc, wproj, bproj, act):
    return fused_mlp_block_spmd(x, ln_s, ln_b, wfc, bfc, wproj, bproj, act)


def _mlp_train_fwd(x, ln_s, ln_b, wfc, bfc, wproj, bproj, act):
    b, sp, d = x.shape
    if _mlp_group(b, sp, d, res=True) is None:  # see _attn_train_fwd
        out = fused_mlp_block_spmd(x, ln_s, ln_b, wfc, bfc, wproj, bproj,
                                   act)
        return out, (x, None, ln_s, ln_b, wfc, bfc, wproj, bproj)
    out, h = fused_mlp_block_res_spmd(x, ln_s, ln_b, wfc, bfc, wproj,
                                      bproj, act)
    return out, (x, h, ln_s, ln_b, wfc, bfc, wproj, bproj)


fused_mlp_block_train.defvjp(_mlp_train_fwd, _mlp_saved_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def fused_mlp_split_train(x, ln_s, ln_b, wfc, bfc, wproj, bproj, act):
    return fused_mlp_split_spmd(x, ln_s, ln_b, wfc, bfc, wproj, bproj, act)


def _mlp_split_train_fwd(x, ln_s, ln_b, wfc, bfc, wproj, bproj, act):
    # saved-activation forward (round 4): the fc kernel emits the
    # pre-gelu residual; the backward is the SAME cut-point rule as the
    # single-kernel MLP (_mlp_saved_bwd) — the split is a VMEM-capacity
    # detail of the forward, not a different function.
    b, sp, d = x.shape
    if _mlp_split_group(b, sp, d, res=True) is None:  # see _attn_train_fwd
        out = fused_mlp_split_spmd(x, ln_s, ln_b, wfc, bfc, wproj, bproj,
                                   act)
        return out, (x, None, ln_s, ln_b, wfc, bfc, wproj, bproj)
    out, h = fused_mlp_split_res_spmd(x, ln_s, ln_b, wfc, bfc, wproj,
                                      bproj, act)
    return out, (x, h, ln_s, ln_b, wfc, bfc, wproj, bproj)


fused_mlp_split_train.defvjp(_mlp_split_train_fwd, _mlp_saved_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10))
def fused_attn_block_pooled_train(x, ln_s, ln_b, wqkv, bqkv, wo, bo,
                                  heads, n_valid, pool_row, causal):
    return fused_attn_block_pooled_spmd(x, ln_s, ln_b, wqkv, bqkv, wo, bo,
                                        heads, n_valid, pool_row, causal)


fused_attn_block_pooled_train.defvjp(
    lambda x, ln_s, ln_b, wqkv, bqkv, wo, bo, heads, n_valid, pool_row,
    causal: (
        fused_attn_block_pooled_spmd(x, ln_s, ln_b, wqkv, bqkv, wo, bo,
                                     heads, n_valid, pool_row, causal),
        (x, ln_s, ln_b, wqkv, bqkv, wo, bo),
    ),
    _recompute_bwd(
        lambda heads, n_valid, pool_row, causal, *ts: _pooled_block_xla(
            *ts, heads, n_valid, pool_row, causal)
    ),
)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10))
def fused_attn_block_pooled_dyn_train(x, rows, ln_s, ln_b, wqkv, bqkv,
                                      wo, bo, heads, n_valid, causal):
    return fused_attn_block_pooled_dyn_spmd(
        x, rows, ln_s, ln_b, wqkv, bqkv, wo, bo, heads, n_valid, causal)


def _pooled_dyn_train_bwd(heads, n_valid, causal, res, g):
    x, rows, ln_s, ln_b, wqkv, bqkv, wo, bo = res
    _, vjp = jax.vjp(
        lambda x, ln_s, ln_b, wqkv, bqkv, wo, bo: _pooled_block_xla_dyn(
            x, rows, ln_s, ln_b, wqkv, bqkv, wo, bo, heads, n_valid, causal
        ),
        x, ln_s, ln_b, wqkv, bqkv, wo, bo,
    )
    gx, gls, glb, gwqkv, gbqkv, gwo, gbo = vjp(g)
    # integer row indices take a symbolic-zero (float0) cotangent
    grows = np.zeros(rows.shape, jax.dtypes.float0)
    return gx, grows, gls, glb, gwqkv, gbqkv, gwo, gbo


fused_attn_block_pooled_dyn_train.defvjp(
    lambda x, rows, ln_s, ln_b, wqkv, bqkv, wo, bo, heads, n_valid,
    causal: (
        fused_attn_block_pooled_dyn_spmd(x, rows, ln_s, ln_b, wqkv, bqkv,
                                         wo, bo, heads, n_valid, causal),
        (x, rows, ln_s, ln_b, wqkv, bqkv, wo, bo),
    ),
    _pooled_dyn_train_bwd,
)
