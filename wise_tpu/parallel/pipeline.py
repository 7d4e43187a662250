"""Pipeline parallelism for transformer stacks over a 'pp' mesh axis.

The reference has no distributed execution at all (SURVEY.md §2:
single-process, single-GPU); wise-tpu's training already shards batch
('dp') and tensor ('mp') dimensions via GSPMD (parallel/train.py). This
module adds the third classic axis: GPipe-style pipeline parallelism,
expressed TPU-natively as a `shard_map` program — contiguous layer slices
live on successive 'pp' ranks, microbatch activations hop stage-to-stage
over ICI with `lax.ppermute`, and the whole schedule is a `lax.scan`, so
`jax.grad` differentiates straight through it (ppermute's transpose is the
reverse ppermute; no hand-written backward schedule).

Design notes:
- Layer parameters are STACKED: each leaf gets a leading (n_layers, ...)
  axis, sharded `P('pp')`, so every rank holds exactly its contiguous
  `n_layers / n_stages` slice and applies it with a `lax.scan` over
  layers (one compiled layer body, not L inlined copies).
- The schedule runs `M + S - 1` ticks for M microbatches over S stages.
  Rank 0 feeds microbatch t at tick t; rank s processes microbatch t - s;
  edge ticks compute on clamped (recomputed) inputs and their outputs are
  masked out — branch-free, static shapes, XLA-friendly.
- The last stage's outputs return to every rank via one `psum` (outputs
  are zero elsewhere). A production deployment would keep the head on the
  last stage instead; the psum keeps this module composable with
  replicated heads and costs one activation all-reduce.
- Batch stays sharded over 'dp' THROUGH the pipeline: the shard_map runs
  over ('pp', 'dp') jointly, each device pipelining its own batch shard.

Memory: backward keeps each tick's activations live (standard GPipe
behaviour). Pass ``remat=True`` to rematerialise each stage application
in the backward pass, trading ~33% more FLOPs for O(S + M) fewer stored
activations — same lever as parallel/train.py's remat.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from jax import shard_map


def stack_layer_params(per_layer_params: list) -> Any:
    """Stack a list of identically-structured per-layer param pytrees into
    one pytree whose leaves carry a leading (n_layers, ...) axis."""
    if not per_layer_params:
        raise ValueError("need at least one layer")
    return jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs, axis=0), *per_layer_params
    )


def unstack_layer_params(stacked: Any) -> list:
    """Inverse of stack_layer_params (host-side convenience for tests and
    checkpoint interop)."""
    n = jax.tree_util.tree_leaves(stacked)[0].shape[0]
    return [
        jax.tree_util.tree_map(lambda x: x[i], stacked) for i in range(n)
    ]


def extract_resblock_params(tower_params: dict, prefix: str = "resblocks_"):
    """Pull the per-layer `resblocks_{i}` subtrees out of a flax
    Transformer param dict (models/clip/model.py Transformer) in layer
    order, plus the remainder (embed/head params) with the layers removed."""
    layers = []
    rest = {}
    for key, sub in tower_params.items():
        if key.startswith(prefix):
            layers.append((int(key[len(prefix):]), sub))
        else:
            rest[key] = sub
    if not layers:
        raise ValueError(f"no '{prefix}*' subtrees found")
    layers.sort(key=lambda kv: kv[0])
    return [sub for _, sub in layers], rest


class PipelinedStack:
    """A transformer layer stack executed pipeline-parallel over 'pp'.

    ``layer_fn(layer_params, x) -> x`` applies ONE layer. ``stacked``
    params must have leading axis n_layers divisible by the mesh's 'pp'
    size; the batch must be divisible by dp * n_microbatches.

    Call ``apply(stacked, x)`` inside or outside jit; it is differentiable
    wrt both arguments.
    """

    def __init__(self, mesh: Mesh, layer_fn: Callable, *,
                 n_microbatches: int, remat: bool = False):
        if "pp" not in mesh.axis_names or "dp" not in mesh.axis_names:
            raise ValueError("mesh needs 'pp' and 'dp' axes")
        self.mesh = mesh
        self.layer_fn = layer_fn
        self.n_microbatches = int(n_microbatches)
        self.remat = bool(remat)
        if self.n_microbatches < 1:
            raise ValueError("n_microbatches must be >= 1")

    # -- sharding helpers ------------------------------------------------
    def param_sharding(self):
        """NamedSharding for stacked layer params: layer axis over 'pp'."""
        return NamedSharding(self.mesh, P("pp"))

    def batch_sharding(self):
        return NamedSharding(self.mesh, P("dp"))

    def place(self, stacked, x):
        """Device_put params/batch with the pipeline's shardings."""
        stacked = jax.tree_util.tree_map(
            lambda a: jax.device_put(a, self.param_sharding()), stacked
        )
        return stacked, jax.device_put(x, self.batch_sharding())

    # -- execution -------------------------------------------------------
    def apply(self, stacked, x):
        S = self.mesh.shape["pp"]
        M = self.n_microbatches
        n_layers = jax.tree_util.tree_leaves(stacked)[0].shape[0]
        if n_layers % S:
            raise ValueError(
                f"{n_layers} layers not divisible by pp={S}"
            )
        dp = self.mesh.shape["dp"]
        if x.shape[0] % (dp * M):
            raise ValueError(
                f"batch {x.shape[0]} not divisible by dp*microbatches "
                f"= {dp}*{M}"
            )

        layer_fn = self.layer_fn

        def apply_stage(stage_params, h):
            def body(carry, one_layer):
                return layer_fn(one_layer, carry), None

            if self.remat:
                body = jax.checkpoint(body)
            h, _ = jax.lax.scan(body, h, stage_params)
            return h

        def shard_body(stage_params, xs):
            # xs: (B/dp, T, W) this device's batch shard, replicated
            # across 'pp'; stage_params: (n_layers/S, ...) this rank's
            # contiguous layer slice
            s = jax.lax.axis_index("pp")
            mb = xs.reshape((M, xs.shape[0] // M) + xs.shape[1:])
            if S == 1:
                # degenerate pipeline: straight scan over layers
                out = jax.vmap(lambda m: apply_stage(stage_params, m))(mb)
                return out.reshape(xs.shape)

            perm = [(i, i + 1) for i in range(S - 1)]
            zero = jnp.zeros_like(mb[0])
            out0 = jnp.zeros_like(mb)

            def tick(carry, t):
                buf, out = carry
                m_idx = jnp.clip(t - s, 0, M - 1)
                feed = jax.lax.dynamic_index_in_dim(
                    mb, jnp.clip(t, 0, M - 1), keepdims=False
                )
                inp = jnp.where(s == 0, feed, buf)
                y = apply_stage(stage_params, inp)
                valid = (t - s >= 0) & (t - s < M)
                y = jnp.where(valid, y, jnp.zeros_like(y))
                # last stage banks its finished microbatch
                bank = jnp.where((s == S - 1) & valid, y, 0.0)
                out = jax.lax.dynamic_update_index_in_dim(
                    out,
                    jax.lax.dynamic_index_in_dim(
                        out, m_idx, keepdims=False
                    ) + bank,
                    m_idx, axis=0,
                )
                nxt = jax.lax.ppermute(y, "pp", perm)
                return (nxt, out), None

            (_, out), _ = jax.lax.scan(
                tick, (zero, out0), jnp.arange(M + S - 1)
            )
            # outputs live on the last rank only; one all-reduce
            # replicates them across 'pp' (zeros elsewhere)
            out = jax.lax.psum(out, "pp")
            return out.reshape(xs.shape)

        fn = shard_map(
            shard_body,
            mesh=self.mesh,
            in_specs=(P("pp"), P("dp")),
            out_specs=P("dp"),
            check_vma=False,
        )
        return fn(stacked, x)
