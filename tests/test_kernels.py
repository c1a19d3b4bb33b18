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
