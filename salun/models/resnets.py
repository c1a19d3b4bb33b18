"""Small CIFAR ResNet-s (20/32/44/56/110) in flax.

Parity with the reference's `ResNets` (Classification/models/ResNets.py:82-191,
akamaster-style): 16→32→64 channels, option-A identity shortcut = stride-2
subsample + zero-pad channels (ResNets.py:98-109).
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from .layers import (CIFAR_MEAN, CIFAR_STD, TorchBatchNorm,
                     normalize_by_channel_mean_std)


class BasicBlockA(nn.Module):
    """3x3-3x3 block with option-A (parameter-free) shortcut."""

    filters: int
    stride: int = 1
    norm: object = TorchBatchNorm
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.filters, (3, 3), strides=self.stride, padding=1,
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = self.norm(name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.filters, (3, 3), strides=1, padding=1,
                    use_bias=False, dtype=self.dtype, name="conv2")(y)
        y = self.norm(name="bn2")(y)

        shortcut = x
        if self.stride != 1 or x.shape[-1] != self.filters:
            # Option A (ResNets.py:98-109): subsample spatially, zero-pad
            # channels by filters//4 on each side. NHWC equivalent of
            # x[:, :, ::2, ::2] + F.pad on channel dim.
            shortcut = x[:, :: self.stride, :: self.stride, :]
            pad = self.filters // 4
            shortcut = jnp.pad(shortcut, ((0, 0), (0, 0), (0, 0), (pad, pad)))
        return nn.relu(y + shortcut)


class ResNetS(nn.Module):
    """CIFAR ResNet-s: conv3x3(16) stem, 3 stages of n blocks each."""

    n_blocks: int
    num_classes: int = 10
    normalize_input: bool = True
    mean: Sequence[float] = CIFAR_MEAN
    std: Sequence[float] = CIFAR_STD
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = partial(
            TorchBatchNorm, use_running_average=not train, momentum=0.9,
            epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32,
        )
        if self.normalize_input:
            x = normalize_by_channel_mean_std(x, self.mean, self.std)
        x = x.astype(self.dtype)

        x = nn.Conv(16, (3, 3), strides=1, padding=1, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        x = norm(name="bn1")(x)
        x = nn.relu(x)

        for i, filters in enumerate((16, 32, 64)):
            for j in range(self.n_blocks):
                stride = 2 if i > 0 and j == 0 else 1
                x = BasicBlockA(filters=filters, stride=stride, norm=norm,
                                dtype=self.dtype, name=f"layer{i + 1}_{j}")(x)

        x = jnp.mean(x, axis=(1, 2))
        x = nn.Dense(self.num_classes, dtype=jnp.float32, name="fc")(x)
        return x


def resnet20s(num_classes: int = 10, **kw) -> ResNetS:
    return ResNetS(n_blocks=3, num_classes=num_classes, **kw)


def resnet32s(num_classes: int = 10, **kw) -> ResNetS:
    return ResNetS(n_blocks=5, num_classes=num_classes, **kw)


def resnet44s(num_classes: int = 10, **kw) -> ResNetS:
    return ResNetS(n_blocks=7, num_classes=num_classes, **kw)


def resnet56s(num_classes: int = 10, **kw) -> ResNetS:
    return ResNetS(n_blocks=9, num_classes=num_classes, **kw)


def resnet110s(num_classes: int = 10, **kw) -> ResNetS:
    return ResNetS(n_blocks=18, num_classes=num_classes, **kw)
