"""Pallas kernel correctness (interpret mode on CPU; the real-TPU run is
exercised by bench.py / scripts/validate_kernels_tpu.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from salun.kernels.attention import _xla_attention
from salun.kernels.flash_attention import flash_attention
from salun.kernels.groupnorm_silu import groupnorm_silu, groupnorm_silu_reference
from salun.kernels.masked_update import (
    BLOCK, masked_sgd_update, masked_sgd_update_reference,
)


def test_flash_attention_matches_xla(rng):
    b, n, d = 2, 256, 128
    q = jnp.asarray(rng.standard_normal((b, n, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, n, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, n, d)), jnp.float32)
    want = _xla_attention(q, k, v, d**-0.5)
    with pltpu.force_tpu_interpret_mode():
        got = flash_attention(q, k, v, scale=d**-0.5, block_q=128,
                              block_k=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5,
                               atol=2e-5)


def test_groupnorm_silu_matches_reference(rng):
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 64)), jnp.float32)
    scale = jnp.asarray(rng.standard_normal(64), jnp.float32)
    bias = jnp.asarray(rng.standard_normal(64), jnp.float32)
    want = groupnorm_silu_reference(x, scale, bias, groups=32)
    with pltpu.force_tpu_interpret_mode():
        got = groupnorm_silu(x, scale, bias, groups=32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5,
                               atol=1e-5)


def test_masked_sgd_update_matches_reference(rng):
    n = BLOCK
    p = jnp.asarray(rng.standard_normal(n), jnp.float32)
    m = jnp.asarray(rng.standard_normal(n), jnp.float32)
    g = jnp.asarray(rng.standard_normal(n), jnp.float32)
    mask = jnp.asarray((rng.random(n) > 0.5), jnp.float32)
    t0 = jnp.asarray(rng.standard_normal(n), jnp.float32)
    want_p, want_m = masked_sgd_update_reference(p, m, g, mask, t0, 0.01)
    with pltpu.force_tpu_interpret_mode():
        got_p, got_m = masked_sgd_update(p, m, g, mask, t0, 0.01)
    np.testing.assert_allclose(np.asarray(got_p), np.asarray(want_p),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(got_m), np.asarray(want_m),
                               rtol=1e-6, atol=1e-7)


def test_flash_attention_vjp_matches_autodiff(rng):
    """Pallas backward vs XLA autodiff through the reference attention."""
    from salun.kernels.flash_attention import flash_attention_trainable

    b, n, d = 2, 256, 128
    q = jnp.asarray(rng.standard_normal((b, n, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, n, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, n, d)), jnp.float32)
    scale = d**-0.5

    def loss_ref(q, k, v):
        return jnp.sum(jnp.sin(_xla_attention(q, k, v, scale)))

    def loss_flash(q, k, v):
        with pltpu.force_tpu_interpret_mode():
            o = flash_attention_trainable(q, k, v, scale, 128, 128)
        return jnp.sum(jnp.sin(o))

    want = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        got = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    for w, g in zip(want, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=2e-4,
                                   atol=2e-4)


def test_plms_matches_loop_reference(rng):
    """PLMS scan vs a straightforward python-loop re-derivation."""
    from salun.diffusion.sampling import plms_steps
    from salun.diffusion.schedules import DiffusionSchedule

    s = DiffusionSchedule.create(num_diffusion_timesteps=20)
    W = jnp.asarray(rng.standard_normal((3, 3)) * 0.1, jnp.float32)

    def eps(x, t):
        return jnp.einsum("bhwc,cd->bhwd", x, W) + 0.01 * t.reshape(-1, 1, 1, 1)

    x0 = jnp.asarray(rng.standard_normal((2, 4, 4, 3)), jnp.float32)
    seq = list(range(0, 20, 5))
    got, _ = plms_steps(eps, x0, seq, s)

    # loop reference (plms.py:268-382 update equations)
    def x_prev(e, xt, i, j):
        at = np.asarray(s.alpha_bar(jnp.array([i])))[0]
        ap = np.asarray(s.alpha_bar(jnp.array([j])))[0]
        px0 = (xt - np.sqrt(1 - at) * e) / np.sqrt(at)
        return np.sqrt(ap) * px0 + np.sqrt(1 - ap) * e

    ts = list(reversed(seq))
    ts_next = list(reversed([-1] + seq[:-1]))
    x = np.asarray(x0)
    old = []
    for i, j in zip(ts, ts_next):
        t = np.full((2,), i, np.float32)
        e_t = np.asarray(eps(jnp.asarray(x), jnp.asarray(t)))
        if len(old) == 0:
            xp = x_prev(e_t, x, i, j)
            e_next = np.asarray(eps(jnp.asarray(xp),
                                    jnp.full((2,), j, jnp.float32)))
            e_prime = (e_t + e_next) / 2
        elif len(old) == 1:
            e_prime = (3 * e_t - old[-1]) / 2
        elif len(old) == 2:
            e_prime = (23 * e_t - 16 * old[-1] + 5 * old[-2]) / 12
        else:
            e_prime = (55 * e_t - 59 * old[-1] + 37 * old[-2]
                       - 9 * old[-3]) / 24
        x = x_prev(e_prime, x, i, j)
        old.append(e_t)
        if len(old) > 3:
            old.pop(0)
    np.testing.assert_allclose(np.asarray(got), x, rtol=1e-4, atol=1e-5)


def test_flash_dispatch_policy(monkeypatch):
    """_use_flash: TPU-only, seq ≥ 1024, and the grid must tile evenly
    with the (clamped) autotuned blocks — a 1280-seq is 128-aligned but
    not block-aligned and must stay on XLA."""
    from salun.kernels import attention as A

    def mk(n, c=64, nk=None):
        q = jnp.zeros((2, n, c))
        k = jnp.zeros((2, nk if nk is not None else n, c))
        return q, k

    monkeypatch.delenv("SALUN_FORCE_FLASH", raising=False)
    monkeypatch.delenv("SALUN_DISABLE_FLASH", raising=False)

    # not on TPU → never
    monkeypatch.setattr(A.jax, "default_backend", lambda: "cpu")
    assert not A._use_flash(*mk(4096))

    monkeypatch.setattr(A.jax, "default_backend", lambda: "tpu")
    assert A._use_flash(*mk(4096))
    assert A._use_flash(*mk(1024))
    assert not A._use_flash(*mk(256))        # below threshold
    assert not A._use_flash(*mk(1280))       # 128-aligned, not block-aligned
    assert not A._use_flash(*mk(4096, c=60))  # channel not 8-aligned
    # cross-attention: short kv side (77-token text) stays on XLA
    assert not A._use_flash(*mk(4096, nk=128))

    monkeypatch.setenv("SALUN_DISABLE_FLASH", "1")
    assert not A._use_flash(*mk(4096))


def test_groupnorm_silu_trainable_grads(rng, monkeypatch):
    """custom-VJP grads match autodiff through the XLA reference, on both
    the fallback path and the (interpret-mode) Pallas forward path."""
    from salun.kernels.groupnorm_silu import (
        groupnorm_silu_reference, groupnorm_silu_trainable,
    )

    x = jnp.asarray(rng.standard_normal((2, 8, 8, 64)), jnp.float32)
    s = jnp.asarray(rng.standard_normal(64), jnp.float32)
    b = jnp.asarray(rng.standard_normal(64), jnp.float32)

    def loss_ref(x, s, b):
        y = groupnorm_silu_reference(x, s, b, groups=32)
        return jnp.sum(y * jnp.cos(y))

    def loss_tr(x, s, b):
        y = groupnorm_silu_trainable(x, s, b, 32, 1e-6)
        return jnp.sum(y * jnp.cos(y))

    want = jax.grad(loss_ref, argnums=(0, 1, 2))(x, s, b)

    monkeypatch.delenv("SALUN_FORCE_GN_PALLAS", raising=False)
    got = jax.grad(loss_tr, argnums=(0, 1, 2))(x, s, b)
    for w, g in zip(want, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=2e-4,
                                   atol=2e-4)

    monkeypatch.setenv("SALUN_FORCE_GN_PALLAS", "1")
    with pltpu.force_tpu_interpret_mode():
        got_p = jax.grad(loss_tr, argnums=(0, 1, 2))(x, s, b)
    for w, g in zip(want, got_p):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=2e-4,
                                   atol=2e-4)


def test_groupnorm_silu_module_param_compat(rng):
    """GroupNormSiLU module params are pytree-identical to nn.GroupNorm's,
    and the bf16 output matches GroupNorm+silu within bf16 tolerance."""
    import flax.linen as nn

    from salun.kernels.groupnorm_silu import GroupNormSiLU

    x = jnp.asarray(rng.standard_normal((2, 8, 8, 64)), jnp.float32)

    fused = GroupNormSiLU(dtype=jnp.float32)
    ref = nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=jnp.float32,
                       param_dtype=jnp.float32)
    vf = fused.init(jax.random.PRNGKey(0), x)
    vr = ref.init(jax.random.PRNGKey(0), x)
    assert (jax.tree.structure(vf) == jax.tree.structure(vr))
    assert all(a.shape == b.shape and a.dtype == b.dtype
               for a, b in zip(jax.tree.leaves(vf), jax.tree.leaves(vr)))

    # seed nontrivial affine params
    params = {"params": {
        "scale": jnp.asarray(rng.standard_normal(64), jnp.float32),
        "bias": jnp.asarray(rng.standard_normal(64), jnp.float32)}}
    got = fused.apply(params, x)
    want = nn.silu(ref.apply(params, x))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5,
                               atol=1e-5)
