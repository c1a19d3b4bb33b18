"""Distribution tests: every jitted program must produce the same result on
1 device and on an 8-device mesh (SURVEY.md §4 distributed strategy)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from salun.core import masked_opt, threshold_mask
from salun.core.train import TrainState, make_train_step
from salun.dist import make_mesh, shard_batch
from salun.models import create_model


def _setup(key):
    model = create_model("resnet20s", num_classes=10)
    x = jnp.zeros((16, 32, 32, 3))
    variables = model.init(key, x, train=False)
    return model, variables


def _batch(rng, n=16):
    return {
        "image": rng.integers(0, 255, (n, 32, 32, 3), dtype=np.uint8),
        "label": rng.integers(0, 10, (n,), dtype=np.int64).astype(np.int32),
        "weight": np.ones((n,), np.float32),
    }


def test_masked_train_step_sharding_invariance(mesh8, key, rng):
    """One masked-RL step: data-parallel over the mesh must equal the
    single-device result (grads all-reduced by XLA over ICI)."""
    model, variables = _setup(key)
    sal = jax.tree.map(
        lambda p: jnp.abs(jax.random.normal(jax.random.PRNGKey(1), p.shape)),
        variables["params"])
    mask = threshold_mask(sal, 0.5)
    theta0 = jax.tree.map(jnp.copy, variables["params"])
    tx = masked_opt.masked(masked_opt.sgd(0.05, 0.9, 5e-4), mask, theta0)
    step = make_train_step(model, tx, use_augment=False, num_classes=10)
    batch = _batch(rng)

    # single device
    state1 = TrainState.create(
        {"params": jax.tree.map(jnp.copy, variables["params"]),
         "batch_stats": jax.tree.map(jnp.copy, variables["batch_stats"])}, tx)
    s1, m1 = step(state1, jax.tree.map(jnp.asarray, batch),
                  jax.random.PRNGKey(3))

    # 8-device mesh: batch sharded, params replicated
    repl = NamedSharding(mesh8, P())
    state8 = TrainState.create(
        {"params": jax.device_put(variables["params"], repl),
         "batch_stats": jax.device_put(variables["batch_stats"], repl)}, tx)
    sharded = shard_batch(mesh8, batch)
    s8, m8 = step(state8, sharded, jax.random.PRNGKey(3))

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]),
                               rtol=1e-5)
    # cross-device reduction order differs from the single-device order, so
    # agreement is approximate (the masked coords must still be bitwise 0)
    for a, b, m in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s8.params),
                       jax.tree.leaves(mask)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-2, atol=5e-5)
        np.testing.assert_array_equal(
            np.asarray(a)[np.asarray(m) == 0], np.asarray(b)[np.asarray(m) == 0]
        )


def test_saliency_accumulation_sharding_invariance(mesh8, key, rng):
    from salun.core import accumulate_saliency
    from salun.core.train import cross_entropy
    from salun.data.loader import to_float

    model, variables = _setup(key)
    params, bs = variables["params"], variables["batch_stats"]

    def grad_fn(params, batch):
        def loss(p):
            out = model.apply({"params": p, "batch_stats": bs},
                              to_float(batch["image"]), train=False)
            return -cross_entropy(out, batch["label"], batch["weight"])

        return jax.grad(loss)(params)

    batches = [_batch(rng) for _ in range(2)]
    sal1 = accumulate_saliency(grad_fn, params,
                               (jax.tree.map(jnp.asarray, b) for b in batches))
    sal8 = accumulate_saliency(
        grad_fn, jax.device_put(params, NamedSharding(mesh8, P())),
        (shard_batch(mesh8, b) for b in batches))
    m1 = threshold_mask(sal1, 0.5)
    m8 = threshold_mask(sal8, 0.5)
    same = sum(
        float((np.asarray(a) == np.asarray(b)).mean())
        for a, b in zip(jax.tree.leaves(m1), jax.tree.leaves(m8))
    ) / len(jax.tree.leaves(m1))
    assert same > 0.999, same  # fp-accumulation order may flip rare ties


def test_sd_unet_tp_pspecs(key):
    """TP sharding rules mark attention/GEGLU matmuls and nothing else."""
    from jax.sharding import PartitionSpec as P

    from salun.dist.sharding import count_sharded, sd_unet_pspecs
    from salun.sd import SDModules, SDUNetConfig, VAEConfig, CLIPTextConfig

    modules = SDModules.create(
        SDUNetConfig(model_channels=32, num_res_blocks=1,
                     attention_resolutions=(1, 2), channel_mult=(1, 2),
                     num_heads=2, context_dim=24),
        VAEConfig(ch=32, ch_mult=(1, 2, 2, 2), num_res_blocks=1),
        CLIPTextConfig(hidden_size=24, num_layers=2, num_heads=2,
                       max_length=8),
        num_timesteps=8,
    )
    params = modules.init(key, image_size=8)
    pspecs = sd_unet_pspecs(params["unet"])
    assert count_sharded(pspecs) > 0

    from salun.utils.tree import flatten_names

    flat_p = flatten_names(params["unet"])
    flat_s = flatten_names(pspecs)
    for name, spec in flat_s.items():
        sharded = any(a is not None for a in spec)
        if sharded:
            assert any(name.endswith(sfx) for sfx in (
                "to_q/kernel", "to_k/kernel", "to_v/kernel",
                "net_0_proj/kernel", "to_out_0/kernel", "net_2/kernel",
            )), name
            # sharded dim must divide by 2 (the model-axis size we test)
            dim = 1 if spec == P(None, "model") else 0
            assert flat_p[name].shape[dim] % 2 == 0, name


def test_fsdp_matches_replicated(mesh8, key, rng):
    """FSDP (ZeRO-3) sharded masked train step == replicated step: params,
    moments, and the state-carried mask split over the data axis must not
    change the math (GSPMD gathers are exact)."""
    from salun.dist.fsdp import count_sharded, fsdp_pspecs, shard_fsdp

    model, variables = _setup(key)
    batch = _batch(rng)

    def build(params_placed, mask_placed, theta0_placed):
        tx = masked_opt.masked(masked_opt.sgd(0.01, 0.9, 5e-4),
                               mask_placed, theta0_placed)
        # the step donates its state — give each run its own copies
        state = TrainState.create(
            {"params": jax.tree.map(jnp.copy, params_placed),
             "batch_stats": jax.tree.map(jnp.copy,
                                         variables["batch_stats"])}, tx)
        step = make_train_step(model, tx, use_augment=False,
                               random_labels=False, num_classes=10)
        return step, state

    def mk_inputs():
        mask = jax.tree.map(
            lambda p: (jax.random.uniform(jax.random.PRNGKey(3), p.shape)
                       > 0.5).astype(jnp.float32), variables["params"])
        theta0 = jax.tree.map(jnp.copy, variables["params"])
        return mask, theta0

    # replicated run
    mask, theta0 = mk_inputs()
    step, state = build(variables["params"], mask, theta0)
    state_r, m_r = step(state, batch, jax.random.PRNGKey(7))

    # FSDP run on the 8-device mesh
    pspecs = fsdp_pspecs(variables["params"], mesh8, min_size=2 ** 6)
    assert count_sharded(pspecs) > 0
    mask, theta0 = mk_inputs()
    with mesh8:
        params_f = shard_fsdp(variables["params"], mesh8, pspecs)
        mask_f = shard_fsdp(mask, mesh8, pspecs)
        theta0_f = shard_fsdp(theta0, mesh8, pspecs)
        step_f, state_f0 = build(params_f, mask_f, theta0_f)
        state_f, m_f = step_f(state_f0, shard_batch(mesh8, batch),
                              jax.random.PRNGKey(7))
        jax.block_until_ready(state_f.params)

    np.testing.assert_allclose(float(m_f["loss"]), float(m_r["loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(state_f.params),
                    jax.tree.leaves(state_r.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)
    # big leaves must actually be sharded after the step
    big = [p for p in jax.tree.leaves(state_f.params) if p.size >= 2 ** 6]
    assert any(not p.sharding.is_fully_replicated for p in big)


def test_ring_attention_matches_single_device(mesh8, key, rng):
    """Sequence-parallel ring attention (salun.dist.ring_attention) vs the
    framework-wide single-device oracle: forward outputs AND input grads
    must match with q/k/v sharded 8-way over the sequence axis — proving
    the online-softmax ring state and the reverse-ring autodiff are exact,
    not approximate."""
    from salun.dist import ring_attention
    from salun.kernels.attention import _xla_attention

    B, N, C = 2, 64, 16
    q, k, v = (jnp.asarray(rng.standard_normal((B, N, C)).astype(np.float32))
               for _ in range(3))
    scale = C ** -0.5

    want = _xla_attention(q, k, v, scale)
    got = ring_attention(q, k, v, mesh8, seq_axis="data")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-6)
    # output keeps the sequence sharding (dim 1 split over the mesh)
    assert not got.sharding.is_fully_replicated

    def loss_ring(q, k, v):
        return (ring_attention(q, k, v, mesh8) ** 2).sum()

    def loss_ref(q, k, v):
        return (_xla_attention(q, k, v, scale) ** 2).sum()

    gr = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    gw = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gr, gw):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-5, atol=5e-6)


def test_ring_attention_rejects_ragged_sequence(mesh8, rng):
    from salun.dist import ring_attention

    x = jnp.zeros((1, 12, 8))  # 12 % 8 != 0
    with pytest.raises(ValueError):
        ring_attention(x, x, x, mesh8)
