"""Validate the Pallas kernels against their XLA references on a real TPU.

Run this on a TPU runtime with native Mosaic compilation (NOT through the
axon remote-compile tunnel, which cannot build Pallas kernels — see
salun/kernels/attention.py::_use_flash). Usage:

    SALUN_FORCE_FLASH=1 python scripts/validate_kernels_tpu.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from salun.kernels.attention import _xla_attention
from salun.kernels.flash_attention import flash_attention
from salun.kernels.groupnorm_silu import groupnorm_silu, groupnorm_silu_reference
from salun.kernels.masked_update import (
    BLOCK, masked_sgd_update, masked_sgd_update_reference,
)


def bench(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.default_rng(0)
    print("backend:", jax.default_backend(), jax.devices())

    # DDPM attention shape (res16: 256 tokens × 512ch)
    q = jnp.asarray(rng.standard_normal((8, 256, 512)), jnp.float32)
    k, v = q + 0.1, q - 0.1
    a = flash_attention(q, k, v, scale=512**-0.5)
    b = _xla_attention(q, k, v, 512**-0.5)
    print("flash(256x512) max|diff|:", float(jnp.abs(a - b).max()))

    # SD-scale: 4096 tokens × 128 head-dim
    q2 = jnp.asarray(rng.standard_normal((4, 4096, 128)), jnp.float32)
    k2, v2 = q2 + 0.1, q2 - 0.1
    tf = bench(lambda *x: flash_attention(*x, scale=128**-0.5), q2, k2, v2)
    tx = bench(lambda *x: _xla_attention(*x, 128**-0.5), q2, k2, v2)
    d = float(jnp.abs(
        flash_attention(q2, k2, v2, scale=128**-0.5)
        - _xla_attention(q2, k2, v2, 128**-0.5)).max())
    print(f"flash(4096x128): {tf*1e3:.2f}ms vs xla {tx*1e3:.2f}ms, "
          f"max|diff| {d:.2e}")

    x = jnp.asarray(rng.standard_normal((8, 32, 32, 128)), jnp.float32)
    s = jnp.asarray(rng.standard_normal(128), jnp.float32)
    bb = jnp.asarray(rng.standard_normal(128), jnp.float32)
    d = float(jnp.abs(groupnorm_silu(x, s, bb)
                      - groupnorm_silu_reference(x, s, bb)).max())
    print("groupnorm_silu max|diff|:", d)

    n = BLOCK * 4
    p = jnp.asarray(rng.standard_normal(n), jnp.float32)
    m = jnp.zeros(n)
    g = jnp.asarray(rng.standard_normal(n), jnp.float32)
    mask = jnp.asarray(rng.random(n) > 0.5, jnp.float32)
    t0 = jnp.array(p)
    wp, wm = masked_sgd_update_reference(p, m, g, mask, t0, 0.01)
    gp, gm = masked_sgd_update(p, m, g, mask, t0, 0.01)
    print("masked_sgd max|diff|:", float(jnp.abs(wp - gp).max()),
          float(jnp.abs(wm - gm).max()))


if __name__ == "__main__":
    main()
