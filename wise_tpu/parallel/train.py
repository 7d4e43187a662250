"""Sharded CLIP contrastive training on a device mesh.

The reference has no training at all (SURVEY.md §2: inference-only,
single-GPU); this is new TPU-native capability: fine-tune/pretrain the CLIP
towers with data parallelism over 'dp' and Megatron-style tensor parallelism
over 'mp', expressed as GSPMD sharding constraints — XLA inserts the
collectives (psum for the contrastive logits across dp shards, all-reduce
for mp partials) over ICI.

Sharding rules:
- attention in_proj / mlp_fc kernels: split output dim over 'mp'
- attention out_proj / mlp_proj kernels: split input dim over 'mp'
- embeddings / LayerNorms / projections: replicated
- batch: split over 'dp'
"""

from __future__ import annotations

import functools
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.clip.model import CLIP, CLIPConfig


def _spec_for_path(path: Tuple, leaf) -> P:
    keys = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
    joined = "/".join(str(k) for k in keys)
    if leaf.ndim == 2:
        if "in_proj" in joined or "mlp_fc" in joined:
            return P(None, "mp")
        if "out_proj" in joined or "mlp_proj" in joined:
            return P("mp", None)
    return P()


def clip_param_shardings(params, mesh: Mesh):
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, _spec_for_path(path, leaf)),
        params,
    )


def build_optimizer(learning_rate: float, weight_decay: float,
                    warmup_steps: int = 0, total_steps: int = 0,
                    grad_clip: float = 0.0):
    """adamw with optional warmup-cosine schedule and global-norm clipping
    — shared by the dp/mp trainer and the pipeline-parallel trainer."""
    if warmup_steps or total_steps:
        schedule = optax.warmup_cosine_decay_schedule(
            init_value=0.0,
            peak_value=learning_rate,
            warmup_steps=max(warmup_steps, 1),
            decay_steps=max(total_steps, warmup_steps + 1),
            end_value=learning_rate * 0.01,
        )
    else:
        schedule = learning_rate
    tx = optax.adamw(schedule, weight_decay=weight_decay)
    if grad_clip and grad_clip > 0:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip), tx)
    return tx


def save_train_checkpoint(ckpt_dir, step: int, params, opt_state):
    """orbax save of {params, opt_state} under step_<N> (works for any
    param layout — dp/mp trees and pipeline-stacked trees alike)."""
    import orbax.checkpoint as ocp

    from pathlib import Path

    path = Path(ckpt_dir).absolute() / f"step_{step:08d}"
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, {"params": params, "opt_state": opt_state})
    return path


def restore_train_checkpoint(ckpt_dir, params_like, opt_state_like,
                             step: int = -1):
    """Restore latest (or given) step; shapes/shardings come from the
    provided abstract targets. Returns (step, params, opt_state)."""
    import orbax.checkpoint as ocp

    from pathlib import Path

    d = Path(ckpt_dir).absolute()
    if step < 0:
        steps = sorted(
            int(p.name.split("_")[1])
            for p in d.glob("step_*")
            if p.is_dir()
        )
        if not steps:
            raise FileNotFoundError(f"no checkpoints under {d}")
        step = steps[-1]
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(
            d / f"step_{step:08d}",
            {"params": params_like, "opt_state": opt_state_like},
        )
    # re-establish the template's shardings (restore may place arrays on
    # a single device)
    params = jax.tree_util.tree_map(
        lambda t, r: jax.device_put(r, t.sharding),
        params_like, restored["params"],
    )
    opt_state = jax.tree_util.tree_map(
        lambda t, r: jax.device_put(r, t.sharding),
        opt_state_like, restored["opt_state"],
    )
    return step, params, opt_state


def clip_loss(img_feats, txt_feats, logit_scale):
    """Symmetric InfoNCE over the global batch. Feature matrices are
    replicated post-encoder (XLA all-gathers dp-sharded activations as
    needed for the (B, B) logits)."""
    logits = logit_scale * img_feats @ txt_feats.T
    labels = jnp.arange(logits.shape[0])
    li = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    lt = optax.softmax_cross_entropy_with_integer_labels(logits.T, labels)
    return 0.5 * (li.mean() + lt.mean())


class CLIPTrainer:
    def __init__(self, config: CLIPConfig, mesh: Mesh,
                 learning_rate: float = 1e-4, weight_decay: float = 0.01,
                 warmup_steps: int = 0, total_steps: int = 0,
                 grad_clip: float = 0.0):
        # the fused attention kernel AND the whole-block kernels are
        # differentiable (custom VJPs: ops/attention.py
        # fused_attention_trainable; ops/block.py *_train wrappers with
        # plain-ops recompute backwards) and carry GSPMD batch-sharding
        # rules, so fine-tuning with fused_attention=True or
        # fused_block=True (the production inference config) runs the
        # kernels on single chips AND under dp-sharded meshes — each chip
        # executes its own batch shard, no gathers; the backward pass is
        # pure XLA either way (scripts/bench_train_step.py A/Bs all three)
        self.config = config
        self.mesh = mesh
        self.model = CLIP(config)
        self.optimizer = build_optimizer(
            learning_rate, weight_decay, warmup_steps, total_steps,
            grad_clip,
        )

        self.batch_sharding = NamedSharding(mesh, P("dp"))
        self.replicated = NamedSharding(mesh, P())

    def init(self, rng) -> Tuple[Any, Any]:
        c = self.config
        params = self.model.init(
            rng,
            jnp.zeros((1, c.image_size, c.image_size, 3), jnp.float32),
            jnp.zeros((1, c.context_length), jnp.int32),
        )
        shardings = clip_param_shardings(params, self.mesh)
        params = jax.tree_util.tree_map(
            lambda x, s: jax.device_put(x, s), params, shardings
        )
        # optimizer state: adam moments shard like their parameters (path
        # suffix match), scalar leaves (count) replicate
        opt_shapes = jax.eval_shape(self.optimizer.init, params)
        param_paths = {
            jax.tree_util.keystr(p): s
            for p, s in jax.tree_util.tree_flatten_with_path(shardings)[0]
        }

        def shard_for(path, leaf):
            key = jax.tree_util.keystr(path)
            for pkey, s in param_paths.items():
                if key.endswith(pkey):
                    return s
            return self.replicated

        opt_shardings = jax.tree_util.tree_map_with_path(
            shard_for, opt_shapes
        )
        opt_state = jax.jit(
            self.optimizer.init, out_shardings=opt_shardings
        )(params)
        self.param_shardings = shardings
        return params, opt_state

    def make_train_step(self):
        model, optimizer = self.model, self.optimizer

        def loss_fn(params, images, tokens):
            img_f, txt_f, scale = model.apply(params, images, tokens)
            return clip_loss(img_f, txt_f, scale)

        @functools.partial(
            jax.jit,
            donate_argnums=(0, 1),
        )
        def train_step(params, opt_state, images, tokens):
            images = jax.lax.with_sharding_constraint(
                images, self.batch_sharding
            )
            tokens = jax.lax.with_sharding_constraint(
                tokens, self.batch_sharding
            )
            loss, grads = jax.value_and_grad(loss_fn)(params, images, tokens)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        return train_step

    # ------------------------------------------------------------------
    # checkpoint / resume (orbax) — a subsystem the reference lacks
    # entirely (SURVEY.md §5: no checkpoint/resume anywhere)
    # ------------------------------------------------------------------
    def save_checkpoint(self, ckpt_dir, step: int, params, opt_state):
        return save_train_checkpoint(ckpt_dir, step, params, opt_state)

    def restore_checkpoint(self, ckpt_dir, params_like, opt_state_like,
                           step: int = -1):
        return restore_train_checkpoint(
            ckpt_dir, params_like, opt_state_like, step
        )
