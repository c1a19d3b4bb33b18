"""Validate + benchmark the Pallas kernels against XLA on a real TPU.

All calls are jitted (timing an unjitted pallas_call measures retracing,
not the kernel). Prints correctness (max|diff| vs the XLA reference) and
per-call latency for: flash attention fwd, flash attention fwd+bwd
(custom-VJP pallas backward), fused GroupNorm+SiLU, fused masked-SGD.

Usage:  python scripts/validate_kernels_tpu.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from salun.utils.tpu_bench import enable_compile_cache, scan_time

enable_compile_cache()

from salun.kernels.attention import _xla_attention
from salun.kernels.flash_attention import (
    flash_attention, flash_attention_trainable,
)
from salun.kernels.groupnorm_silu import groupnorm_silu, groupnorm_silu_reference
from salun.kernels.masked_update import (
    BLOCK, masked_sgd_update, masked_sgd_update_reference,
)


def maxdiff(a, b):
    return max(float(jnp.max(jnp.abs(x - y)))
               for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)))


def main():
    rng = np.random.default_rng(0)
    print("backend:", jax.default_backend(), jax.devices())

    # ---- flash attention: DDPM res16 shape and SD 64×64 self-attn shapes
    for (b, n, d) in [(8, 256, 512), (8, 4096, 128), (16, 4096, 64)]:
        q = jnp.asarray(rng.standard_normal((b, n, d)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((b, n, d)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((b, n, d)), jnp.float32)
        sc = d ** -0.5
        f = jax.jit(lambda q, k, v: flash_attention(q, k, v, scale=sc))
        x = jax.jit(lambda q, k, v: _xla_attention(q, k, v, sc))
        dd = maxdiff(f(q, k, v), x(q, k, v))
        tf_, tx = scan_time(f, q, k, v), scan_time(x, q, k, v)
        print(f"flash fwd ({b},{n},{d}): {tf_*1e3:.2f}ms vs xla "
              f"{tx*1e3:.2f}ms ({tx/tf_:.2f}x), max|diff| {dd:.2e}")

        gf = jax.jit(jax.grad(
            lambda q, k, v: flash_attention_trainable(q, k, v, sc).sum(),
            argnums=(0, 1, 2)))
        gx = jax.jit(jax.grad(
            lambda q, k, v: _xla_attention(q, k, v, sc).sum(),
            argnums=(0, 1, 2)))
        dd = maxdiff(gf(q, k, v), gx(q, k, v))
        g3 = lambda o: o[0] + o[1] + o[2]  # noqa: E731 — keep dq,dk,dv live
        tf_, tx = (scan_time(gf, q, k, v, feed=g3),
                   scan_time(gx, q, k, v, feed=g3))
        print(f"flash bwd ({b},{n},{d}): {tf_*1e3:.2f}ms vs xla "
              f"{tx*1e3:.2f}ms ({tx/tf_:.2f}x), max|diff| {dd:.2e}")

    # ---- fused GroupNorm+SiLU (DDPM/SD block shapes)
    for (b, h, c) in [(8, 32, 128), (2, 64, 320), (2, 32, 640)]:
        xx = jnp.asarray(rng.standard_normal((b, h, h, c)), jnp.float32)
        s = jnp.asarray(rng.standard_normal(c), jnp.float32)
        bb = jnp.asarray(rng.standard_normal(c), jnp.float32)
        f = jax.jit(lambda x, s, b2: groupnorm_silu(x, s, b2))
        r = jax.jit(lambda x, s, b2: groupnorm_silu_reference(x, s, b2))
        dd = maxdiff(f(xx, s, bb), r(xx, s, bb))
        tf_, tx = scan_time(f, xx, s, bb), scan_time(r, xx, s, bb)
        print(f"gn_silu ({b},{h}x{h},{c}): {tf_*1e3:.3f}ms vs xla "
              f"{tx*1e3:.3f}ms ({tx/tf_:.2f}x), max|diff| {dd:.2e}")

    # ---- fused masked-SGD update
    n = BLOCK * 1024  # ~11M params scale
    p = jnp.asarray(rng.standard_normal(n), jnp.float32)
    m0 = jnp.zeros(n)
    g = jnp.asarray(rng.standard_normal(n), jnp.float32)
    mask = jnp.asarray(rng.random(n) > 0.5, jnp.float32)
    t0 = jnp.array(p)
    f = jax.jit(lambda *a: masked_sgd_update(*a, 0.01))
    r = jax.jit(lambda *a: masked_sgd_update_reference(*a, 0.01))
    dd = maxdiff(f(p, m0, g, mask, t0), r(p, m0, g, mask, t0))
    fp = lambda o: o[0]  # noqa: E731 — feed new params back
    tf_, tx = (scan_time(f, p, m0, g, mask, t0, feed=fp),
               scan_time(r, p, m0, g, mask, t0, feed=fp))
    print(f"masked_sgd ({n/1e6:.0f}M): {tf_*1e3:.3f}ms vs xla "
          f"{tx*1e3:.3f}ms ({tx/tf_:.2f}x), max|diff| {dd:.2e}")


if __name__ == "__main__":
    main()
