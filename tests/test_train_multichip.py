"""Sharded CLIP training step on the simulated 8-device mesh, plus the
driver-contract dryrun."""

import jax
import numpy as np


def test_dryrun_multichip_8():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


def test_train_step_decreases_loss():
    import jax.numpy as jnp

    from wise_tpu.models.clip.model import CLIPConfig
    from wise_tpu.parallel.mesh import get_mesh
    from wise_tpu.parallel.train import CLIPTrainer

    mesh = get_mesh(dp=4, mp=2)
    config = CLIPConfig(
        embed_dim=16, image_size=32, patch_size=16, vision_width=32,
        vision_layers=1, vision_heads=2, context_length=8, vocab_size=64,
        text_width=32, text_heads=2, text_layers=1,
    )
    trainer = CLIPTrainer(config, mesh, learning_rate=1e-2)
    params, opt_state = trainer.init(jax.random.PRNGKey(0))
    step = trainer.make_train_step()
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.standard_normal((8, 32, 32, 3)), jnp.float32)
    tokens = jnp.asarray(rng.integers(1, 63, (8, 8)), jnp.int32)
    losses = []
    for _ in range(5):
        params, opt_state, loss = step(params, opt_state, images, tokens)
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], f"loss did not decrease: {losses}"


def test_param_shardings_partition_mlp():
    from jax.sharding import PartitionSpec as P

    from wise_tpu.models.clip.model import CLIP, CLIPConfig
    from wise_tpu.parallel.mesh import get_mesh
    from wise_tpu.parallel.train import clip_param_shardings

    mesh = get_mesh(dp=4, mp=2)
    config = CLIPConfig(
        embed_dim=16, image_size=32, patch_size=16, vision_width=32,
        vision_layers=1, vision_heads=2, context_length=8, vocab_size=64,
        text_width=32, text_heads=2, text_layers=1,
    )
    model = CLIP(config)
    import jax.numpy as jnp

    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 32, 32, 3), jnp.float32),
        jnp.zeros((1, 8), jnp.int32),
    )
    sh = clip_param_shardings(params, mesh)
    block = sh["params"]["visual"]["transformer"]["resblocks_0"]
    assert block["attn"]["in_proj"]["kernel"].spec == P(None, "mp")
    assert block["attn"]["out_proj"]["kernel"].spec == P("mp", None)
    assert block["mlp_fc"]["kernel"].spec == P(None, "mp")
    assert block["mlp_proj"]["kernel"].spec == P("mp", None)
    assert sh["params"]["logit_scale"].spec == P()


def test_optimizer_state_shards_like_params():
    from jax.sharding import PartitionSpec as P

    import jax.numpy as jnp

    from wise_tpu.models.clip.model import CLIPConfig
    from wise_tpu.parallel.mesh import get_mesh
    from wise_tpu.parallel.train import CLIPTrainer

    mesh = get_mesh(dp=4, mp=2)
    config = CLIPConfig(
        embed_dim=16, image_size=32, patch_size=16, vision_width=32,
        vision_layers=1, vision_heads=2, context_length=8, vocab_size=64,
        text_width=32, text_heads=2, text_layers=1,
    )
    trainer = CLIPTrainer(config, mesh)
    params, opt_state = trainer.init(jax.random.PRNGKey(0))
    # adam mu for an mp-sharded kernel must carry the same sharding
    mu_kernel = opt_state[0].mu["params"]["visual"]["transformer"][
        "resblocks_0"]["attn"]["in_proj"]["kernel"]
    assert mu_kernel.sharding.spec == P(None, "mp")
    # scalar count replicates
    assert opt_state[0].count.sharding.spec == P()
