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

from .layers import CIFAR_MEAN, CIFAR_STD, normalize_by_channel_mean_std

# Configuration "D" (VGG-16), reference VGG.py cfgs (VGG.py:97-145).
CFG_D = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
         512, 512, 512, "M", 512, 512, 512, "M")


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
            nn.BatchNorm, use_running_average=not train, momentum=0.9,
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
                x = nn.Conv(int(v), (3, 3), padding=1, dtype=self.dtype,
                            name=f"conv{conv_i}")(x)
                if self.batch_norm:
                    x = norm(name=f"bn{conv_i}")(x)
                x = nn.relu(x)
                conv_i += 1

        if self.lth_head:
            x = jnp.mean(x, axis=(1, 2))  # adaptive avgpool (1,1)
            x = nn.Dense(self.num_classes, dtype=jnp.float32, name="classifier")(x)
        else:
            # adaptive avgpool to 2x2 then MLP head (VGG.py:60-67)
            b, h, w, c = x.shape
            x = nn.avg_pool(x, (max(h // 2, 1), max(w // 2, 1)),
                            strides=(max(h // 2, 1), max(w // 2, 1)))
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
