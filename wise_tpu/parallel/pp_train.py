"""Pipeline-parallel CLIP contrastive training (pp x dp mesh).

Builds on parallel/pipeline.py's GPipe stack: the two transformer towers
of the flagship CLS-pooled CLIP family run pipeline-parallel over 'pp'
(contiguous layer slices per rank, microbatched ppermute schedule), while
the cheap embed/head math stays replicated and the batch stays sharded
over 'dp'. The reference has no training and no distributed execution at
all (SURVEY.md §2); parallel/train.py covers dp+mp — this adds the pp
axis for depth-dominated towers whose layers outweigh a chip.

Parameters keep full interop with models/clip: ``restructure_clip_params``
reshapes a standard CLIP tree into the pipeline layout ({rest, stack}
per tower, stack leaves carrying a leading layer axis sharded P('pp')),
and ``restore_clip_params`` inverts it, so converted OpenCLIP checkpoints
fine-tune pipelined and serve through the normal extractor unchanged.

The embed/head math below mirrors models/clip/model.py's
VisionTransformer/TextTransformer (:481-671) exactly — the per-layer body
IS the same ResidualAttentionBlock module, so any drift is confined to
~20 lines of embed/head glue, pinned against CLIP.apply by
tests/test_pp_train.py.

Scope: vision_pool == "cls", causal argmax-pooled text, fused kernels off
(the Pallas block kernels' GSPMD rules target plain 'dp' batch sharding;
running them inside the pp shard_map is future work — they compose
per-chip, but are uncalibrated there).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.clip.model import CLIP, CLIPConfig, ResidualAttentionBlock
from .pipeline import (
    PipelinedStack,
    extract_resblock_params,
    stack_layer_params,
    unstack_layer_params,
)
from .train import (
    build_optimizer,
    clip_loss,
    restore_train_checkpoint,
    save_train_checkpoint,
)


# ---------------------------------------------------------------------------
# param layout conversion (standard CLIP tree <-> pipeline layout)
# ---------------------------------------------------------------------------

def restructure_clip_params(params: dict) -> dict:
    """Standard CLIP param tree (CLIP.init / convert.py output) ->
    {'visual': {'rest', 'stack'}, 'text': {'rest', 'stack'},
    'logit_scale'} with stacked (n_layers, ...) transformer leaves."""
    tree = params["params"] if "params" in params else params
    out = {"logit_scale": tree["logit_scale"]}
    for tower in ("visual", "text"):
        sub = dict(tree[tower])
        layers, rest_tf = extract_resblock_params(sub.pop("transformer"))
        if rest_tf:
            raise ValueError(f"unexpected transformer leaves: {rest_tf}")
        out[tower] = {"rest": sub, "stack": stack_layer_params(layers)}
    return out


def restore_clip_params(pp_params: dict) -> dict:
    """Inverse of restructure_clip_params, returning a tree CLIP.apply
    accepts (wrapped in {'params': ...})."""
    tree = {"logit_scale": pp_params["logit_scale"]}
    for tower in ("visual", "text"):
        sub = dict(pp_params[tower]["rest"])
        layers = unstack_layer_params(pp_params[tower]["stack"])
        sub["transformer"] = {
            f"resblocks_{i}": lp for i, lp in enumerate(layers)
        }
        tree[tower] = sub
    return {"params": tree}


def _ln(x, p):
    """flax nn.LayerNorm(epsilon=1e-5, dtype=f32) equivalent."""
    m = x.astype(jnp.float32)
    mu = m.mean(-1, keepdims=True)
    var = ((m - mu) ** 2).mean(-1, keepdims=True)
    return (m - mu) / jnp.sqrt(var + 1e-5) * p["scale"] + p["bias"]


# ---------------------------------------------------------------------------
# trainer
# ---------------------------------------------------------------------------

class PipelinedCLIPTrainer:
    """CLIP contrastive fine-tuning with both towers GPipe-parallel.

    Mesh must carry ('pp', 'dp'). vision_layers and text_layers must each
    divide by the 'pp' size; batch by dp * n_microbatches.
    """

    def __init__(self, config: CLIPConfig, mesh: Mesh, *,
                 n_microbatches: int = 2, learning_rate: float = 1e-4,
                 weight_decay: float = 0.01, warmup_steps: int = 0,
                 total_steps: int = 0, grad_clip: float = 0.0,
                 remat: bool = False):
        if config.vision_pool != "cls" or not config.text_causal \
                or config.text_pool != "argmax":
            raise ValueError(
                "PipelinedCLIPTrainer supports the CLS-pooled causal CLIP "
                "family (see module docstring)"
            )
        if config.fused_attention or config.fused_block:
            raise ValueError("fused kernels are not calibrated inside the "
                             "pp shard_map; disable them for pp training")
        self.config = config
        self.mesh = mesh
        self.model = CLIP(config)
        self.optimizer = build_optimizer(
            learning_rate, weight_decay, warmup_steps, total_steps,
            grad_clip,
        )

        c = config

        def v_layer(lp, h):
            return ResidualAttentionBlock(
                c.vision_width, c.vision_heads, c.act or c.quick_gelu,
                dtype=c.dtype, softmax_f32=c.attn_softmax_f32,
            ).apply({"params": lp}, h)

        L = c.context_length
        causal = np.triu(np.full((L, L), -np.inf, np.float32), k=1)
        causal = causal[None, None]  # (1, 1, L, L) — a trace constant

        def t_layer(lp, h):
            return ResidualAttentionBlock(
                c.text_width, c.text_heads, c.act or c.quick_gelu,
                dtype=c.dtype, softmax_f32=c.attn_softmax_f32,
            ).apply({"params": lp}, h, causal)

        self.v_pipe = PipelinedStack(mesh, v_layer,
                                     n_microbatches=n_microbatches,
                                     remat=remat)
        self.t_pipe = PipelinedStack(mesh, t_layer,
                                     n_microbatches=n_microbatches,
                                     remat=remat)
        self.replicated = NamedSharding(mesh, P())
        self.batch_sharding = NamedSharding(mesh, P("dp"))

    # -- forward ---------------------------------------------------------
    def encode_image(self, pp_params, images):
        """Mirrors VisionTransformer.__call__ (model.py:481-597), matmul
        patchify (math-identical to the conv), pipelined resblocks."""
        c = self.config
        rest = pp_params["visual"]["rest"]
        p, grid = c.patch_size, c.image_size // c.patch_size
        b = images.shape[0]
        kern = rest["conv1"]["kernel"].astype(c.dtype)
        xp = images.astype(c.dtype).reshape(b, grid, p, grid, p, 3)
        xp = xp.transpose(0, 1, 3, 2, 4, 5).reshape(
            b, grid * grid, p * p * 3
        )
        x = xp @ kern.reshape(p * p * 3, c.vision_width)
        cls = jnp.broadcast_to(
            rest["class_embedding"].astype(c.dtype),
            (b, 1, c.vision_width),
        )
        x = jnp.concatenate([cls, x], axis=1)
        x = x + rest["positional_embedding"].astype(c.dtype)
        x = _ln(x, rest["ln_pre"])
        x = self.v_pipe.apply(pp_params["visual"]["stack"], x)
        x = _ln(x[:, 0, :], rest["ln_post"])
        feats = (
            x.astype(c.dtype) @ rest["proj"].astype(c.dtype)
        ).astype(jnp.float32)
        return feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)

    def encode_text(self, pp_params, tokens):
        """Mirrors TextTransformer.__call__ (model.py:599-671)."""
        c = self.config
        rest = pp_params["text"]["rest"]
        x = rest["token_embedding"][tokens].astype(c.dtype)
        x = x + rest["positional_embedding"].astype(c.dtype)
        x = self.t_pipe.apply(pp_params["text"]["stack"], x)
        x = _ln(x, rest["ln_final"])
        eot = jnp.argmax(tokens, axis=-1)
        pooled = x[jnp.arange(x.shape[0]), eot]
        feats = (
            pooled.astype(c.dtype)
            @ rest["text_projection"].astype(c.dtype)
        ).astype(jnp.float32)
        return feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)

    # -- setup -----------------------------------------------------------
    def param_shardings(self, pp_params):
        def spec(path, leaf):
            keys = [getattr(q, "key", getattr(q, "name", str(q)))
                    for q in path]
            return (
                NamedSharding(self.mesh, P("pp"))
                if "stack" in keys else self.replicated
            )

        return jax.tree_util.tree_map_with_path(spec, pp_params)

    def init(self, rng) -> Tuple[Any, Any]:
        c = self.config
        params = self.model.init(
            rng,
            jnp.zeros((1, c.image_size, c.image_size, 3), jnp.float32),
            jnp.zeros((1, c.context_length), jnp.int32),
        )
        return self.prepare(params)

    def prepare(self, clip_params) -> Tuple[Any, Any]:
        """Place a standard CLIP tree (random init or a converted
        checkpoint) into the pipeline layout with pp/replicated shardings
        and build matching optimizer state."""
        pp_params = restructure_clip_params(clip_params)
        shardings = self.param_shardings(pp_params)
        # jit-identity rather than device_put: device_put may alias the
        # caller's buffers (no-op when sharding already matches), and the
        # donating train step would then DELETE the caller's checkpoint
        # arrays; the identity always materialises fresh buffers
        pp_params = jax.jit(
            lambda t: t, out_shardings=shardings
        )(pp_params)
        opt_shapes = jax.eval_shape(self.optimizer.init, pp_params)
        param_paths = {
            jax.tree_util.keystr(q): s
            for q, s in jax.tree_util.tree_flatten_with_path(shardings)[0]
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
        )(pp_params)
        self.shardings = shardings
        return pp_params, opt_state

    # -- training --------------------------------------------------------
    def make_train_step(self):
        optimizer = self.optimizer

        def loss_fn(pp_params, images, tokens):
            img = self.encode_image(pp_params, images)
            txt = self.encode_text(pp_params, tokens)
            return clip_loss(
                img, txt, jnp.exp(pp_params["logit_scale"])
            )

        def train_step(pp_params, opt_state, images, tokens):
            images = jax.lax.with_sharding_constraint(
                images, self.batch_sharding
            )
            tokens = jax.lax.with_sharding_constraint(
                tokens, self.batch_sharding
            )
            loss, grads = jax.value_and_grad(loss_fn)(
                pp_params, images, tokens
            )
            updates, opt_state = optimizer.update(
                grads, opt_state, pp_params
            )
            pp_params = optax.apply_updates(pp_params, updates)
            return pp_params, opt_state, loss

        return jax.jit(train_step, donate_argnums=(0, 1))

    # -- checkpoint / resume (same orbax layout as CLIPTrainer; the
    # params inside the checkpoint are the PIPELINE tree — export a
    # standard CLIP tree for serving with restore_clip_params) ----------
    def save_checkpoint(self, ckpt_dir, step: int, pp_params, opt_state):
        return save_train_checkpoint(ckpt_dir, step, pp_params, opt_state)

    def restore_checkpoint(self, ckpt_dir, params_like, opt_state_like,
                           step: int = -1):
        return restore_train_checkpoint(
            ckpt_dir, params_like, opt_state_like, step
        )
