"""Fused masked-SGD update Pallas kernel.

The SalUn inner loop applies, per parameter tensor and per step:
grad·mask → momentum → weight decay → param update → θ₀ restore → momentum
re-mask (reference: two Python dict walks per step,
Classification/unlearn/RL.py:11-34). The optax path already fuses this into
a handful of XLA ops; this kernel performs the whole update for a flat
parameter shard in ONE pass over HBM — params/momentum/grad/mask/θ₀ are
each read once and params/momentum written once, the bandwidth lower bound.

Operates on 1-D flat buffers (callers ravel the pytree once at optimizer
init) so the entire model updates as a single kernel launch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 1 << 16  # 64k f32 = 256KB per buffer slice, 5 in + 2 out in VMEM


def _masked_sgd_kernel(p_ref, m_ref, g_ref, mask_ref, t0_ref, lr_ref,
                       p_out, m_out, *, momentum: float, wd: float):
    p = p_ref[:].astype(jnp.float32)
    g = g_ref[:].astype(jnp.float32) * mask_ref[:]
    d = g + wd * p
    buf = momentum * m_ref[:] + d
    new_p = p - lr_ref[0] * buf
    keep = mask_ref[:] > 0
    p_out[:] = jnp.where(keep, new_p, t0_ref[:]).astype(p_out.dtype)
    m_out[:] = jnp.where(keep, buf, 0.0).astype(m_out.dtype)


def masked_sgd_update(params_flat, momentum_flat, grads_flat, mask_flat,
                      theta0_flat, lr, *, momentum: float = 0.9,
                      wd: float = 5e-4):
    """One fused pass: returns (new_params, new_momentum).

    Exact semantics of torch SGD(momentum, wd) + SalUn masking
    (RL.py:11-34): masked grads, θ₀ pinning, momentum zeroing.
    """
    n = params_flat.shape[0]
    assert n % BLOCK == 0, f"pad flat params to a multiple of {BLOCK}"
    kernel = functools.partial(_masked_sgd_kernel, momentum=momentum, wd=wd)
    lr_arr = jnp.full((1,), lr, jnp.float32)
    grid = (n // BLOCK,)
    bspec = pl.BlockSpec((BLOCK,), lambda i: (i,), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[bspec, bspec, bspec, bspec, bspec,
                  pl.BlockSpec((1,), lambda i: (0,),
                               memory_space=pltpu.SMEM)],
        out_specs=(bspec, bspec),
        out_shape=(
            jax.ShapeDtypeStruct((n,), params_flat.dtype),
            jax.ShapeDtypeStruct((n,), jnp.float32),
        ),
        input_output_aliases={0: 0, 1: 1},
    )(params_flat, momentum_flat, grads_flat, mask_flat, theta0_flat, lr_arr)


def masked_sgd_update_reference(params, momentum_buf, grads, mask, theta0,
                                lr, *, momentum=0.9, wd=5e-4):
    g = grads * mask
    d = g + wd * params
    buf = momentum * momentum_buf + d
    new_p = params - lr * buf
    keep = mask > 0
    return jnp.where(keep, new_p, theta0), jnp.where(keep, buf, 0.0)
