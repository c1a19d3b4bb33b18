"""Pipeline parallelism (salun/dist/pipeline.py): exactness vs sequential
execution on the 8-device virtual CPU mesh — forward, gradients, and a
full dp×pp training step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from salun.dist import make_mesh
from salun.dist.pipeline import (
    pipeline_apply, stack_stage_params, stage_sharding,
)


def _mlp_stage(params, h):
    """One residual MLP stage: h + W2·gelu(W1·h)."""
    z = jax.nn.gelu(h @ params["w1"] + params["b1"])
    return h + z @ params["w2"]


def _make_stages(n_stages, d, hidden, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), n_stages)
    return [
        {
            "w1": jax.random.normal(k, (d, hidden)) * (d ** -0.5),
            "b1": jnp.zeros((hidden,)),
            "w2": jax.random.normal(
                jax.random.fold_in(k, 1), (hidden, d)) * (hidden ** -0.5),
        }
        for k in ks
    ]


def _sequential(stages, x):
    for p in stages:
        x = _mlp_stage(p, x)
    return x


@pytest.mark.parametrize("n_micro", [1, 4, 16])
def test_pipeline_forward_matches_sequential(n_micro):
    mesh = make_mesh(data=1, model=8)
    stages = _make_stages(8, d=16, hidden=32)
    stacked = jax.device_put(stack_stage_params(stages),
                             stage_sharding(mesh, "model"))
    x = jax.random.normal(jax.random.PRNGKey(3), (16, 16))

    got = jax.jit(lambda p, x: pipeline_apply(
        _mlp_stage, p, x, mesh, axis="model",
        num_microbatches=n_micro))(stacked, x)
    want = _sequential(stages, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-6)


def test_pipeline_grads_match_sequential():
    mesh = make_mesh(data=1, model=8)
    stages = _make_stages(8, d=8, hidden=16, seed=1)
    stacked = jax.device_put(stack_stage_params(stages),
                             stage_sharding(mesh, "model"))
    x = jax.random.normal(jax.random.PRNGKey(4), (8, 8))
    y = jax.random.normal(jax.random.PRNGKey(5), (8, 8))

    def piped_loss(p):
        out = pipeline_apply(_mlp_stage, p, x, mesh, axis="model",
                             num_microbatches=4)
        return jnp.mean((out - y) ** 2)

    def seq_loss(stages_list):
        return jnp.mean((_sequential(stages_list, x) - y) ** 2)

    got = jax.jit(jax.grad(piped_loss))(stacked)
    want_list = jax.grad(seq_loss)(stages)
    want = stack_stage_params(want_list)
    jax.tree.map(
        lambda g, w: np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=1e-4, atol=1e-6),
        got, want)


def test_pipeline_dp_pp_training_step():
    """2×4 (data, pipe) mesh: microbatches sharded over data, stages over
    pipe; two jitted SGD steps match the single-device trajectory and the
    params stay stage-sharded (no silent gather)."""
    mesh = make_mesh(data=2, model=4)
    stages = _make_stages(4, d=8, hidden=16, seed=2)
    stacked = jax.device_put(stack_stage_params(stages),
                             stage_sharding(mesh, "model"))
    x = jax.random.normal(jax.random.PRNGKey(6), (16, 8))
    y = jax.random.normal(jax.random.PRNGKey(7), (16, 8))

    def loss_fn(p):
        out = pipeline_apply(_mlp_stage, p, x, mesh, axis="model",
                             num_microbatches=4, batch_axis="data")
        return jnp.mean((out - y) ** 2)

    @jax.jit
    def sgd(p):
        loss, g = jax.value_and_grad(loss_fn)(p)
        return jax.tree.map(lambda a, b: a - 0.1 * b, p, g), loss

    def seq_sgd(stages_list):
        def loss(sl):
            return jnp.mean((_sequential(sl, x) - y) ** 2)
        l, g = jax.value_and_grad(loss)(stages_list)
        return jax.tree.map(lambda a, b: a - 0.1 * b, stages_list, g), l

    p, ref = stacked, stages
    for _ in range(2):
        p, loss = sgd(p)
        ref, ref_loss = seq_sgd(ref)
        np.testing.assert_allclose(float(loss), float(ref_loss),
                                   rtol=1e-5, atol=1e-7)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6),
        p, stack_stage_params(ref))
    assert all(not leaf.sharding.is_fully_replicated
               for leaf in jax.tree.leaves(p)), "pp params were gathered"


def test_pipeline_rejects_bad_shapes():
    mesh = make_mesh(data=1, model=8)
    stages = _make_stages(4, d=4, hidden=4)  # 4 stages on an 8-way axis
    stacked = stack_stage_params(stages)
    x = jnp.zeros((8, 4))
    with pytest.raises(ValueError, match="leading dim"):
        pipeline_apply(_mlp_stage, stacked, x, mesh, axis="model")
    stages8 = _make_stages(8, d=4, hidden=4)
    with pytest.raises(ValueError, match="divisible"):
        pipeline_apply(_mlp_stage, stack_stage_params(stages8),
                       jnp.zeros((6, 4)), mesh, axis="model",
                       num_microbatches=4)


def test_pipeline_no_remat_matches_sequential():
    mesh = make_mesh(data=1, model=8)
    stages = _make_stages(8, d=8, hidden=16, seed=3)
    stacked = jax.device_put(stack_stage_params(stages),
                             stage_sharding(mesh, "model"))
    x = jax.random.normal(jax.random.PRNGKey(9), (8, 8))

    def loss(p):
        out = pipeline_apply(_mlp_stage, p, x, mesh, axis="model",
                             num_microbatches=4, remat=False)
        return jnp.sum(out ** 2)

    got = jax.jit(jax.grad(loss))(stacked)
    want = stack_stage_params(jax.grad(
        lambda sl: jnp.sum(_sequential(sl, x) ** 2))(stages))
    # without remat the backward keeps residuals instead of recomputing,
    # which reorders the f32 accumulation through 8 stacked stages —
    # a handful of elements land ~3e-3 relative off the oracle
    jax.tree.map(
        lambda g, w: np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=1e-2, atol=1e-5),
        got, want)
