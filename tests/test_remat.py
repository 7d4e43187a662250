"""Rematerialisation: remat towers train to identical losses (same math,
less activation memory)."""

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from wise_tpu.models.clip.model import CLIPConfig
from wise_tpu.parallel.mesh import get_mesh
from wise_tpu.parallel.train import CLIPTrainer

BASE = CLIPConfig(
    embed_dim=16, image_size=32, patch_size=16, vision_width=32,
    vision_layers=2, vision_heads=2, context_length=8, vocab_size=64,
    text_width=32, text_heads=2, text_layers=2,
)


def _losses(config, steps=3):
    mesh = get_mesh(dp=2, mp=1, devices=jax.devices()[:2])
    trainer = CLIPTrainer(config, mesh, learning_rate=1e-2)
    params, opt_state = trainer.init(jax.random.PRNGKey(0))
    step = trainer.make_train_step()
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.standard_normal((4, 32, 32, 3)), jnp.float32)
    tokens = jnp.asarray(rng.integers(1, 63, (4, 8)), jnp.int32)
    out = []
    for _ in range(steps):
        params, opt_state, loss = step(params, opt_state, images, tokens)
        out.append(float(loss))
    return out


def test_remat_matches_plain():
    plain = _losses(BASE)
    remat = _losses(dataclasses.replace(BASE, remat=True))
    np.testing.assert_allclose(plain, remat, rtol=1e-5)
