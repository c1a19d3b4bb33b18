"""VGG-16 (BN) in flax.

Parity with the reference's two VGG variants:
- ``vgg16_bn``      (Classification/models/VGG.py:56-256): avgpool to 2x2,
  classifier 512*4 → 256 → 256 → classes.
- ``vgg16_bn_lth``  (Classification/models/VGG_LTH.py:50-64): avgpool to 1x1,
  single Linear(512, classes).
Both embed CIFAR input normalization (VGG.py:69-72).
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from .layers import (CIFAR_MEAN, CIFAR_STD, TorchBatchNorm,
                     normalize_by_channel_mean_std)

# Configuration "D" (VGG-16), reference VGG.py cfgs (VGG.py:97-145).
# NOTE: the reference's cfg "D" drops torchvision's FINAL "M" (a CIFAR
# adaptation — VGG.py:117-135), leaving a 2x2 feature map at 32px input.
CFG_D = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
         512, 512, 512, "M", 512, 512, 512)


class VGG(nn.Module):
    num_classes: int = 10
    lth_head: bool = False
    batch_norm: bool = True
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

        conv_i = 0
        for v in CFG_D:
            if v == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                # conv bias parity: VGG.py:105 builds bias=False convs,
                # VGG_LTH.py:88 keeps the default bias=True
                x = nn.Conv(int(v), (3, 3), padding=1,
                            use_bias=self.lth_head,
                            dtype=self.dtype, name=f"conv{conv_i}")(x)
                if self.batch_norm:
                    x = norm(name=f"bn{conv_i}")(x)
                x = nn.relu(x)
                conv_i += 1

        if self.lth_head:
            x = jnp.mean(x, axis=(1, 2))  # adaptive avgpool (1,1)
            x = nn.Dense(self.num_classes, dtype=jnp.float32, name="classifier")(x)
        else:
            # AdaptiveAvgPool2d((2,2)) then MLP head (VGG.py:60-67). True
            # adaptive semantics: cell (i,j) averages rows
            # [⌊i·h/2⌋, ⌈(i+1)·h/2⌉) — for CIFAR's 1×1 feature map this
            # REPLICATES to 2×2 (a plain avg_pool would stay 1×1 and halve
            # the fc1 width vs reference checkpoints).
            b, h, w, c = x.shape

            def bounds(n):
                return [(i * n // 2, -((-(i + 1) * n) // 2))
                        for i in range(2)]

            cells = [
                [jnp.mean(x[:, r0:r1, c0:c1, :], axis=(1, 2))
                 for (c0, c1) in bounds(w)]
                for (r0, r1) in bounds(h)
            ]
            x = jnp.stack([jnp.stack(row, axis=1) for row in cells], axis=1)
            x = x.reshape((b, -1))
            x = nn.Dense(256, dtype=jnp.float32, name="fc1")(x)
            x = nn.relu(x)
            x = nn.Dense(256, dtype=jnp.float32, name="fc2")(x)
            x = nn.relu(x)
            x = nn.Dense(self.num_classes, dtype=jnp.float32, name="fc3")(x)
        return x


def vgg16_bn(num_classes: int = 10, **kw) -> VGG:
    return VGG(num_classes=num_classes, lth_head=False, **kw)


def vgg16_bn_lth(num_classes: int = 10, **kw) -> VGG:
    return VGG(num_classes=num_classes, lth_head=True, **kw)
