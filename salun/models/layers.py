"""Shared model layers.

TPU notes: all models run NHWC (XLA's preferred conv layout on TPU) and take a
``dtype`` for activation precision so the conv/matmul FLOPs can run in
bfloat16 on the MXU while params/batch-stats stay float32.
"""

from __future__ import annotations

from typing import Sequence

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


class BatchNorm(nn.Module):
    """BatchNorm2d with torch-compatible defaults (momentum 0.1, eps 1e-5)."""

    use_running_average: bool
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.BatchNorm(
            use_running_average=self.use_running_average,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)
