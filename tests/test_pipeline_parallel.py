"""Pipeline parallelism (parallel/pipeline.py): GPipe-style microbatched
schedule over a 'pp' mesh axis, composed with 'dp' batch sharding.

Parity bar: the pipelined stack must produce the SAME activations and the
SAME gradients as the plain sequential Transformer apply (the reference
has nothing distributed to compare against — the oracle is the
single-device program, like test_sharded_search.py does for search).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from wise_tpu.models.clip.model import ResidualAttentionBlock, Transformer
from wise_tpu.parallel.pipeline import (
    PipelinedStack,
    extract_resblock_params,
    stack_layer_params,
    unstack_layer_params,
)

WIDTH, HEADS, LAYERS = 32, 2, 4
B, T = 8, 10


@pytest.fixture(scope="module")
def tower():
    tf = Transformer(width=WIDTH, layers=LAYERS, heads=HEADS,
                     quick_gelu=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, T, WIDTH), jnp.float32)
    params = tf.init(jax.random.PRNGKey(1), x)["params"]
    return tf, params, x


def _layer_fn(layer_params, h):
    return ResidualAttentionBlock(
        WIDTH, HEADS, quick_gelu=True
    ).apply({"params": layer_params}, h)


def _mesh(pp, dp):
    devs = np.array(jax.devices()[: pp * dp]).reshape(pp, dp)
    return Mesh(devs, ("pp", "dp"))


def _stacked(params):
    per_layer, rest = extract_resblock_params(params)
    assert rest == {}
    return stack_layer_params(per_layer)


@pytest.mark.parametrize("pp,dp,mb", [(2, 2, 2), (2, 4, 1), (4, 2, 2),
                                      (1, 2, 2), (2, 1, 4)])
def test_forward_parity(tower, pp, dp, mb):
    tf, params, x = tower
    want = tf.apply({"params": params}, x)
    pipe = PipelinedStack(_mesh(pp, dp), _layer_fn, n_microbatches=mb)
    stacked, xs = pipe.place(_stacked(params), x)
    got = pipe.apply(stacked, xs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_gradient_parity(tower):
    tf, params, x = tower
    pipe = PipelinedStack(_mesh(2, 2), _layer_fn, n_microbatches=2)
    stacked, xs = pipe.place(_stacked(params), x)

    def seq_loss(p, xx):
        return jnp.sum(tf.apply({"params": p}, xx) ** 2)

    def pipe_loss(sp, xx):
        return jnp.sum(pipe.apply(sp, xx) ** 2)

    want_l, (want_gp, want_gx) = jax.value_and_grad(
        seq_loss, argnums=(0, 1)
    )(params, x)
    got_l, (got_gp, got_gx) = jax.value_and_grad(
        pipe_loss, argnums=(0, 1)
    )(stacked, xs)

    np.testing.assert_allclose(float(got_l), float(want_l), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got_gx), np.asarray(want_gx),
                               rtol=2e-4, atol=2e-4)
    per_layer, _ = extract_resblock_params(params)
    want_stacked_g = stack_layer_params(
        [jax.tree_util.tree_map(lambda a: a, want_gp[f"resblocks_{i}"])
         for i in range(LAYERS)]
    )
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4
        ),
        got_gp, want_stacked_g,
    )


def test_remat_matches(tower):
    tf, params, x = tower
    pipe = PipelinedStack(_mesh(2, 2), _layer_fn, n_microbatches=2,
                          remat=True)
    stacked, xs = pipe.place(_stacked(params), x)
    want = jax.grad(
        lambda p, xx: jnp.sum(tf.apply({"params": p}, xx) ** 2), argnums=1
    )(params, x)
    got = jax.grad(
        lambda sp, xx: jnp.sum(pipe.apply(sp, xx) ** 2), argnums=1
    )(stacked, xs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_jit_and_train_step_shape(tower):
    """One jitted SGD step on the pipelined stack: loss decreases and the
    update preserves the stacked layout."""
    tf, params, x = tower
    pipe = PipelinedStack(_mesh(2, 2), _layer_fn, n_microbatches=2)
    stacked, xs = pipe.place(_stacked(params), x)

    @jax.jit
    def step(sp, xx):
        loss, g = jax.value_and_grad(
            lambda p: jnp.mean(pipe.apply(p, xx) ** 2)
        )(sp)
        return loss, jax.tree_util.tree_map(
            lambda p, gg: p - 1e-3 * gg, sp, g
        )

    l0, sp1 = step(stacked, xs)
    l1, _ = step(sp1, xs)
    assert float(l1) < float(l0)
    assert jax.tree_util.tree_leaves(sp1)[0].shape == \
        jax.tree_util.tree_leaves(stacked)[0].shape


def test_stack_roundtrip(tower):
    _, params, _ = tower
    per_layer, rest = extract_resblock_params(params)
    assert len(per_layer) == LAYERS and rest == {}
    back = unstack_layer_params(stack_layer_params(per_layer))
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)
        ),
        back, per_layer,
    )


def test_validation_errors(tower):
    _, params, x = tower
    pipe = PipelinedStack(_mesh(2, 2), _layer_fn, n_microbatches=3)
    stacked, xs = pipe.place(_stacked(params), x)
    with pytest.raises(ValueError, match="not divisible"):
        pipe.apply(stacked, xs)  # batch 8, dp*mb = 6
    bad = PipelinedStack(_mesh(2, 2), _layer_fn, n_microbatches=2)
    three = stack_layer_params(
        unstack_layer_params(_stacked(params))[:3]
    )
    with pytest.raises(ValueError, match="divisible by pp"):
        bad.apply(three, x)  # 3 layers over pp=2 (checked before placement)
