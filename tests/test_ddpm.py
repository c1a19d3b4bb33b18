"""DDPM workload tests on a tiny CFG U-Net (SURVEY.md §7 stage 3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from salun.diffusion import (
    ConditionalUNet, DiffusionSchedule, UNetConfig, cfg_eps, q_sample,
)
from salun.diffusion.runner import DDPMRunner, DDPMTrainConfig, make_optimizer

TINY = UNetConfig(ch=32, out_ch=3, ch_mult=(1, 2), num_res_blocks=1,
                  attn_resolutions=(8,), dropout=0.0, in_channels=3,
                  image_size=16, n_classes=4, cond_drop_prob=0.1)


@pytest.fixture(scope="module")
def runner():
    sched = DiffusionSchedule.create(num_diffusion_timesteps=50)
    return DDPMRunner(TINY, sched, DDPMTrainConfig(n_iters=4, batch_size=8,
                                                   lr=1e-3, method="rl",
                                                   label_to_forget=1))


@pytest.fixture(scope="module")
def params(runner):
    return runner.init(jax.random.PRNGKey(0))


def _batch(key, n=8, n_classes=4, size=16):
    kx, kc = jax.random.split(key)
    return {
        "image": jax.random.uniform(kx, (n, size, size, 3)),
        "label": jax.random.randint(kc, (n,), 0, n_classes),
    }


def test_schedule_matches_closed_form():
    s = DiffusionSchedule.create(beta_start=1e-4, beta_end=2e-2,
                                 num_diffusion_timesteps=100)
    betas = np.linspace(1e-4, 2e-2, 100)
    np.testing.assert_allclose(np.asarray(s.betas), betas, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(s.alphas_cumprod), np.cumprod(1 - betas), rtol=1e-5
    )
    # boundary alpha_bar(-1) == 1
    assert float(s.alpha_bar(jnp.array([-1]))[0]) == 1.0


def test_qsample_closed_form():
    s = DiffusionSchedule.create(num_diffusion_timesteps=10)
    x0 = jnp.ones((2, 4, 4, 3))
    e = jnp.zeros_like(x0)
    t = jnp.array([0, 9])
    xt = q_sample(x0, t, e, s)
    want = np.sqrt(np.asarray(s.alphas_cumprod)[np.array([0, 9])])
    np.testing.assert_allclose(np.asarray(xt)[:, 0, 0, 0], want, rtol=1e-5)


def test_unet_forward_and_cfg(runner, params):
    model = runner.model
    x = jnp.zeros((2, 16, 16, 3))
    t = jnp.zeros((2,))
    c = jnp.zeros((2,), jnp.int32)
    out = model.apply({"params": params}, x, t, c, train=False,
                      cond_drop_prob=0.0)
    assert out.shape == (2, 16, 16, 3)

    eps = cfg_eps(model, {"params": params}, x, t, c, cond_scale=2.0)
    assert eps.shape == (2, 16, 16, 3)
    # cond_scale 0 reduces to the conditional forward
    eps0 = cfg_eps(model, {"params": params}, x, t, c, cond_scale=0.0)
    np.testing.assert_allclose(np.asarray(eps0), np.asarray(out), atol=1e-5)


def test_train_step_reduces_loss(runner, params):
    tx = make_optimizer(runner.cfg)
    step = runner.make_train_step(tx, ema=False)
    carry = (jax.tree.map(jnp.copy, params), tx.init(params), None)
    key = jax.random.PRNGKey(1)
    batch = jax.tree.map(jnp.asarray, _batch(jax.random.PRNGKey(2)))
    losses = []
    for i in range(6):
        key, sub = jax.random.split(key)
        carry, loss = step(carry, batch, jax.random.PRNGKey(5))  # fixed noise
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses


def test_saliency_unlearn_step_runs(runner, params):
    tx = make_optimizer(runner.cfg)
    mask = jax.tree.map(lambda p: jnp.ones_like(p, jnp.float32), params)
    tx_m = make_optimizer(runner.cfg, mask=mask)
    step = runner.make_saliency_unlearn_step(tx_m, mask=mask)
    carry = (jax.tree.map(jnp.copy, params), tx_m.init(params), None)
    remain = _batch(jax.random.PRNGKey(3))
    forget = _batch(jax.random.PRNGKey(4))
    carry, loss = step(carry, remain, forget, jax.random.PRNGKey(5))
    assert np.isfinite(float(loss))


def test_generate_mask_half(runner, params):
    batches = [_batch(jax.random.PRNGKey(i)) for i in range(2)]
    masks = runner.generate_mask(params, batches, jax.random.PRNGKey(0),
                                 thresholds=(0.5,))
    m = masks[0.5]
    total = sum(int(x.size) for x in jax.tree.leaves(m))
    ones = sum(float(x.sum()) for x in jax.tree.leaves(m))
    assert abs(ones - int(total * 0.5)) < 1


def test_generate_mask_scanned_equals_streamed(runner, params):
    """The single-dispatch lax.scan saliency accumulation must be
    bitwise-identical to the reference-shaped per-batch loop (same key
    split chain, same clip-then-accumulate math) — masks AND the
    underlying saliency ordering agree exactly."""
    batches = [_batch(jax.random.PRNGKey(i)) for i in range(3)]
    m_scan = runner.generate_mask(params, batches, jax.random.PRNGKey(4),
                                  thresholds=(0.3, 0.5))
    m_stream = runner.generate_mask(params, batches, jax.random.PRNGKey(4),
                                    thresholds=(0.3, 0.5), stream=True)
    for t in (0.3, 0.5):
        for a, b in zip(jax.tree.leaves(m_scan[t]),
                        jax.tree.leaves(m_stream[t])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sampler_shapes(runner, params):
    imgs = runner.sample_classes(
        params, jax.random.PRNGKey(0), classes=[0, 1], n_per_class=2,
        timesteps=5,
    )
    assert imgs.shape == (4, 16, 16, 3)
    assert float(imgs.min()) >= 0.0 and float(imgs.max()) <= 1.0


def test_fim_runs(runner, params):
    fim = runner.compute_fim(params, [_batch(jax.random.PRNGKey(7), n=2)],
                             jax.random.PRNGKey(8), n_timestep_samples=2)
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(fim))
    assert all((np.asarray(x) >= 0).all() for x in jax.tree.leaves(fim))


def test_random_hflip_rows_are_orig_or_mirrored(rng):
    """data.random_flip parity (DDPM/datasets/__init__.py:34-46): each
    sample is either untouched or exactly width-mirrored, with both
    outcomes occurring over a batch."""
    from salun.diffusion.runner import random_hflip

    x = jnp.asarray(rng.random((32, 8, 8, 3)).astype(np.float32))
    y = np.asarray(random_hflip(jax.random.PRNGKey(0), x))
    xn = np.asarray(x)
    same = [np.array_equal(y[i], xn[i]) for i in range(32)]
    mirrored = [np.array_equal(y[i], xn[i, :, ::-1, :]) for i in range(32)]
    assert all(s or m for s, m in zip(same, mirrored))
    assert any(same) and any(mirrored)
