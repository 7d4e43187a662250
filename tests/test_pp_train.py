"""Pipeline-parallel CLIP training (parallel/pp_train.py).

Oracle = the single-program CLIP model: the pp trainer's encode/loss must
match CLIP.apply / CLIPTrainer's loss on identical parameters, and the
param-layout conversion must round-trip exactly (checkpoint interop)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from wise_tpu.models.clip.model import CLIP, CLIPConfig
from wise_tpu.parallel.pp_train import (
    PipelinedCLIPTrainer,
    restore_clip_params,
    restructure_clip_params,
)
from wise_tpu.parallel.train import clip_loss

CFG = CLIPConfig(
    embed_dim=32, image_size=32, patch_size=16, vision_width=64,
    vision_layers=4, vision_heads=4, context_length=12, vocab_size=128,
    text_width=64, text_heads=4, text_layers=4, quick_gelu=True,
)


def _mesh(pp, dp):
    devs = np.array(jax.devices()[: pp * dp]).reshape(pp, dp)
    return Mesh(devs, ("pp", "dp"))


@pytest.fixture(scope="module")
def setup():
    model = CLIP(CFG)
    rng = np.random.default_rng(0)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 32, 32, 3), jnp.float32),
        jnp.zeros((1, 12), jnp.int32),
    )
    images = jnp.asarray(rng.standard_normal((8, 32, 32, 3)), jnp.float32)
    tokens = jnp.asarray(
        np.concatenate(
            [rng.integers(1, 100, (8, 11)),
             np.full((8, 1), 127)], axis=1,  # EOT = highest id, at the end
        ),
        jnp.int32,
    )
    return model, params, images, tokens


def test_param_roundtrip(setup):
    _, params, _, _ = setup
    back = restore_clip_params(restructure_clip_params(params))
    flat_a = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_b = jax.tree_util.tree_flatten_with_path(back)[0]
    assert len(flat_a) == len(flat_b)
    b_map = {jax.tree_util.keystr(p): v for p, v in flat_b}
    for p, v in flat_a:
        np.testing.assert_array_equal(
            np.asarray(v), np.asarray(b_map[jax.tree_util.keystr(p)])
        )


def test_encode_parity(setup):
    model, params, images, tokens = setup
    trainer = PipelinedCLIPTrainer(CFG, _mesh(2, 2), n_microbatches=2)
    pp_params, _ = trainer.prepare(params)

    want_img = model.apply(params, images, method=CLIP.encode_image)
    want_txt = model.apply(params, tokens, method=CLIP.encode_text)
    got_img = trainer.encode_image(pp_params, images)
    got_txt = trainer.encode_text(pp_params, tokens)
    np.testing.assert_allclose(np.asarray(got_img), np.asarray(want_img),
                               rtol=3e-5, atol=3e-5)
    np.testing.assert_allclose(np.asarray(got_txt), np.asarray(want_txt),
                               rtol=3e-5, atol=3e-5)


def test_loss_parity_and_training_progress(setup):
    model, params, images, tokens = setup
    trainer = PipelinedCLIPTrainer(CFG, _mesh(2, 2), n_microbatches=2,
                                   learning_rate=1e-3)
    pp_params, opt_state = trainer.prepare(params)

    img, txt, scale = model.apply(params, images, tokens)
    want_loss = float(clip_loss(img, txt, scale))

    step = trainer.make_train_step()
    pp_params, opt_state, l0 = step(pp_params, opt_state, images, tokens)
    np.testing.assert_allclose(float(l0), want_loss, rtol=1e-4)
    losses = [float(l0)]
    for _ in range(3):
        pp_params, opt_state, loss = step(
            pp_params, opt_state, images, tokens
        )
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses
    assert all(np.isfinite(losses))

    # fine-tuned pp params serve through the standard model unchanged
    served = restore_clip_params(jax.device_get(pp_params))
    feats = model.apply(served, images, method=CLIP.encode_image)
    assert np.isfinite(np.asarray(feats)).all()


def test_stack_sharding_is_pp(setup):
    _, params, _, _ = setup
    trainer = PipelinedCLIPTrainer(CFG, _mesh(2, 4), n_microbatches=2)
    pp_params, _ = trainer.prepare(params)
    leaf = jax.tree_util.tree_leaves(pp_params["visual"]["stack"])[0]
    assert leaf.sharding.spec == jax.sharding.PartitionSpec("pp")
    rest_leaf = jax.tree_util.tree_leaves(pp_params["visual"]["rest"])[0]
    assert rest_leaf.sharding.spec == jax.sharding.PartitionSpec()


def test_checkpoint_roundtrip(setup, tmp_path):
    model, params, images, tokens = setup
    trainer = PipelinedCLIPTrainer(CFG, _mesh(2, 2), n_microbatches=2)
    pp_params, opt_state = trainer.prepare(params)
    step = trainer.make_train_step()
    pp_params, opt_state, _ = step(pp_params, opt_state, images, tokens)
    trainer.save_checkpoint(tmp_path, 1, pp_params, opt_state)

    trainer2 = PipelinedCLIPTrainer(CFG, _mesh(2, 2), n_microbatches=2)
    fresh, fresh_opt = trainer2.init(jax.random.PRNGKey(9))
    got_step, restored, r_opt = trainer2.restore_checkpoint(
        tmp_path, fresh, fresh_opt
    )
    assert got_step == 1
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)
        ),
        jax.device_get(pp_params), jax.device_get(restored),
    )
    # restored sharding matches the pipeline layout
    leaf = jax.tree_util.tree_leaves(restored["visual"]["stack"])[0]
    assert leaf.sharding.spec == jax.sharding.PartitionSpec("pp")
    # and training continues from it
    _, _, loss = trainer2.make_train_step()(
        restored, r_opt, images, tokens
    )
    assert np.isfinite(float(loss))


def test_bf16_training(setup):
    import dataclasses

    model, params, images, tokens = setup
    cfg = dataclasses.replace(CFG, dtype=jnp.bfloat16)
    trainer = PipelinedCLIPTrainer(cfg, _mesh(2, 2), n_microbatches=2,
                                   learning_rate=1e-3)
    pp_params, opt_state = trainer.prepare(params)
    step = trainer.make_train_step()
    losses = []
    for _ in range(3):
        pp_params, opt_state, loss = step(
            pp_params, opt_state, images, tokens
        )
        losses.append(float(loss))
    assert all(np.isfinite(losses)) and losses[-1] < losses[0], losses


def test_unsupported_configs_rejected():
    mesh = _mesh(2, 2)
    import dataclasses

    with pytest.raises(ValueError, match="CLS-pooled"):
        PipelinedCLIPTrainer(
            dataclasses.replace(CFG, vision_pool="map", text_causal=False,
                                text_pool="last"),
            mesh,
        )
    with pytest.raises(ValueError, match="fused"):
        PipelinedCLIPTrainer(
            dataclasses.replace(CFG, fused_block=True), mesh
        )
