"""Shared model layers.

TPU notes: all models run NHWC (XLA's preferred conv layout on TPU) and take a
``dtype`` for activation precision so the conv/matmul FLOPs can run in
bfloat16 on the MXU while params/batch-stats stay float32.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

# CIFAR statistics baked into the reference models
# (reference Classification/models/ResNet.py:213-215).
CIFAR_MEAN = (0.4914, 0.4822, 0.4465)
CIFAR_STD = (0.2470, 0.2435, 0.2616)


def normalize_by_channel_mean_std(
    x: jnp.ndarray,
    mean: Sequence[float] = CIFAR_MEAN,
    std: Sequence[float] = CIFAR_STD,
) -> jnp.ndarray:
    """Input normalization as a model-internal op (NHWC).

    Parity with ``NormalizeByChannelMeanStd`` which the reference embeds in
    every classifier (Classification/models/ResNet.py:30-49) so models consume
    raw [0,1] images.
    """
    mean = jnp.asarray(mean, dtype=x.dtype).reshape(1, 1, 1, -1)
    std = jnp.asarray(std, dtype=x.dtype).reshape(1, 1, 1, -1)
    return (x - mean) / std


class TorchBatchNorm(nn.Module):
    """BatchNorm with exact ``torch.nn.BatchNorm2d`` training semantics.

    flax's ``nn.BatchNorm`` updates the running variance with the *biased*
    batch variance; torch uses the *unbiased* (Bessel-corrected, n/(n-1))
    variance for the running-stat update while normalizing with the biased
    one. The difference (≈2e-3 relative at 8×8 spatial, bs 8) is what the
    eval-mode forward — and therefore UA/RA/TA and every MIA feature —
    sees after training, so torch's convention is reproduced here
    (caught by tests/test_driver_parity.py step-level bisection).

    Variable layout matches ``nn.BatchNorm`` (params ``scale``/``bias``,
    batch_stats ``mean``/``var``) so checkpoint importers are unaffected.
    ``momentum`` follows the flax convention: ``ra = m·ra + (1−m)·new``
    (flax 0.9 ≡ torch 0.1).
    """

    use_running_average: bool
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        feat = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (feat,),
                           self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (feat,),
                          self.param_dtype)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((feat,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((feat,), jnp.float32))

        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            axes = tuple(range(x.ndim - 1))
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axes)
            # biased variance normalizes the batch (torch does the same)
            var = jnp.mean(jnp.square(xf - mean), axes)
            if not self.is_initializing():
                n = 1
                for a in axes:
                    n *= x.shape[a]
                unbiased = var * (n / max(n - 1, 1))
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                ra_var.value = m * ra_var.value + (1 - m) * unbiased

        y = (x.astype(self.dtype) - mean.astype(self.dtype)) * jax.lax.rsqrt(
            var.astype(self.dtype) + jnp.asarray(self.epsilon, self.dtype))
        return y * scale.astype(self.dtype) + bias.astype(self.dtype)
