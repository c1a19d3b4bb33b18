"""ResNet-18/50 in flax.linen (NHWC, TPU-first).

Capability parity with the reference's torchvision-style ResNet
(Classification/models/ResNet.py:77-460): BasicBlock/Bottleneck, a CIFAR stem
(3x3 stride-1 conv, no maxpool — ResNet.py:217-223) vs an ImageNet stem
(7x7 stride-2 + 3x3 maxpool — ResNet.py:224-230), and input normalization
embedded in the model (ResNet.py:213-215, applied in ``_forward_impl``
ResNet.py:305).

Design differences from the reference (deliberate, TPU-first):
- NHWC layout, bf16-able compute dtype, params in fp32.
- ``train`` flag selects batch-stat updates (flax mutable collection) instead
  of module-level ``.train()/.eval()`` state.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .layers import (CIFAR_MEAN, CIFAR_STD, TorchBatchNorm,
                     normalize_by_channel_mean_std)

ModuleDef = Any

# torch ImageNet normalization used when imagenet=True datasets are in play.
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


class BasicBlock(nn.Module):
    filters: int
    stride: int = 1
    norm: ModuleDef = TorchBatchNorm
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        residual = x
        y = nn.Conv(
            self.filters, (3, 3), strides=self.stride, padding=1, use_bias=False,
            dtype=self.dtype, name="conv1",
        )(x)
        y = self.norm(name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(
            self.filters, (3, 3), strides=1, padding=1, use_bias=False,
            dtype=self.dtype, name="conv2",
        )(y)
        y = self.norm(name="bn2")(y)

        if residual.shape != y.shape:
            residual = nn.Conv(
                self.filters, (1, 1), strides=self.stride, use_bias=False,
                dtype=self.dtype, name="downsample_conv",
            )(residual)
            residual = self.norm(name="downsample_bn")(residual)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    filters: int
    stride: int = 1
    norm: ModuleDef = TorchBatchNorm
    dtype: jnp.dtype = jnp.float32
    expansion: int = 4

    @nn.compact
    def __call__(self, x):
        residual = x
        y = nn.Conv(self.filters, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        y = self.norm(name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.filters, (3, 3), strides=self.stride, padding=1,
                    use_bias=False, dtype=self.dtype, name="conv2")(y)
        y = self.norm(name="bn2")(y)
        y = nn.relu(y)
        out_ch = self.filters * self.expansion
        y = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv3")(y)
        y = self.norm(name="bn3")(y)

        if residual.shape != y.shape:
            residual = nn.Conv(
                out_ch, (1, 1), strides=self.stride, use_bias=False,
                dtype=self.dtype, name="downsample_conv",
            )(residual)
            residual = self.norm(name="downsample_bn")(residual)
        return nn.relu(y + residual)


class ResNet(nn.Module):
    """ResNet with CIFAR or ImageNet stem and built-in input normalization."""

    stage_sizes: Sequence[int]
    block_cls: Callable
    num_classes: int = 10
    imagenet_stem: bool = False
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

        if self.imagenet_stem:
            x = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False,
                        dtype=self.dtype, name="conv1")(x)
            x = norm(name="bn1")(x)
            x = nn.relu(x)
            x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        else:
            # CIFAR stem: 3x3 stride-1, no maxpool (ResNet.py:217-223).
            x = nn.Conv(64, (3, 3), strides=1, padding=1, use_bias=False,
                        dtype=self.dtype, name="conv1")(x)
            x = norm(name="bn1")(x)
            x = nn.relu(x)

        for i, num_blocks in enumerate(self.stage_sizes):
            filters = 64 * 2**i
            for j in range(num_blocks):
                stride = 2 if i > 0 and j == 0 else 1
                x = self.block_cls(
                    filters=filters, stride=stride, norm=norm,
                    dtype=self.dtype, name=f"layer{i + 1}_{j}",
                )(x)

        x = jnp.mean(x, axis=(1, 2))  # global average pool
        x = nn.Dense(self.num_classes, dtype=jnp.float32, name="fc")(x)
        return x


def resnet18(num_classes: int = 10, imagenet: bool = False, **kw) -> ResNet:
    """Parity: Classification/models/ResNet.py resnet18 (imagenet flag → stem)."""
    return ResNet(stage_sizes=(2, 2, 2, 2), block_cls=BasicBlock,
                  num_classes=num_classes, imagenet_stem=imagenet, **kw)


def resnet34(num_classes: int = 10, imagenet: bool = True, **kw) -> ResNet:
    """Used by the DDPM classifier evaluation (DDPM/train_classifier.py,
    classifier_evaluation.py:16-64 — torchvision ResNet-34 @224)."""
    return ResNet(stage_sizes=(3, 4, 6, 3), block_cls=BasicBlock,
                  num_classes=num_classes, imagenet_stem=imagenet,
                  mean=IMAGENET_MEAN, std=IMAGENET_STD, **kw)


def resnet50(num_classes: int = 10, imagenet: bool = False, **kw) -> ResNet:
    return ResNet(stage_sizes=(3, 4, 6, 3), block_cls=Bottleneck,
                  num_classes=num_classes, imagenet_stem=imagenet, **kw)
