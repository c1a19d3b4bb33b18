"""InceptionV3 (FID variant) in flax + pytorch-fid weight importer.

The reference computes FID features with a frozen TF1 Inception graph
(DDPM/evaluator.py:159-257) and SD's compute-fid uses torchmetrics' torch
port (SD/eval-scripts/compute-fid.py). This is the same network — the
pytorch-fid ``pt_inception-2015-12-05`` variant (InceptionA/C/E with
count_include_pad=False avg-pools; E2 with max-pool) — written in flax/NHWC
so feature extraction runs jitted on TPU.

Weights: :func:`load_params` imports the pytorch-fid checkpoint (a torch
state dict) when a local file is available (zero-egress environments must
provide it); without weights the architecture still runs (random init) for
pipeline tests, and the statistics math in salun.evalx.fid is extractor-
agnostic.

Outputs: pool (2048-d), spatial (first 7 channels of the Mixed_6d OUTPUT —
the Mixed_6e input — flattened; = TF ``mixed_6/conv:0`` channels [:7], the
OpenAI evaluator's sFID feature, DDPM/evaluator.py:36,659-666), and softmax
logits (1008-way in TF; 1000-way here) for the Inception Score.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class BasicConv(nn.Module):
    out_ch: int
    kernel: Tuple[int, int]
    strides: int = 1
    padding: object = 0

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.out_ch, self.kernel, strides=self.strides,
                    padding=self.padding, use_bias=False, name="conv")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-3,
                         name="bn")(x)
        return nn.relu(x)


def _avg_pool_nocount(x, window=3, stride=1, pad=1):
    """avg_pool(count_include_pad=False) — the FID-variant tweak."""
    ones = jnp.ones(x.shape[:1] + x.shape[1:3] + (1,), x.dtype)
    pd = ((pad, pad), (pad, pad))
    summed = nn.pooling.avg_pool(x, (window, window), (stride, stride), pd) \
        * (window * window)
    counts = nn.pooling.avg_pool(ones, (window, window), (stride, stride), pd) \
        * (window * window)
    return summed / counts


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv(64, (1, 1), name="branch1x1")(x)
        b5 = BasicConv(48, (1, 1), name="branch5x5_1")(x)
        b5 = BasicConv(64, (5, 5), padding=2, name="branch5x5_2")(b5)
        b3 = BasicConv(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = BasicConv(96, (3, 3), padding=1, name="branch3x3dbl_2")(b3)
        b3 = BasicConv(96, (3, 3), padding=1, name="branch3x3dbl_3")(b3)
        bp = _avg_pool_nocount(x)
        bp = BasicConv(self.pool_features, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv(384, (3, 3), strides=2, name="branch3x3")(x)
        bd = BasicConv(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv(96, (3, 3), padding=1, name="branch3x3dbl_2")(bd)
        bd = BasicConv(96, (3, 3), strides=2, name="branch3x3dbl_3")(bd)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    c7: int

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv(192, (1, 1), name="branch1x1")(x)
        c7 = self.c7
        b7 = BasicConv(c7, (1, 1), name="branch7x7_1")(x)
        b7 = BasicConv(c7, (1, 7), padding=((0, 0), (3, 3)),
                       name="branch7x7_2")(b7)
        b7 = BasicConv(192, (7, 1), padding=((3, 3), (0, 0)),
                       name="branch7x7_3")(b7)
        bd = BasicConv(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv(c7, (7, 1), padding=((3, 3), (0, 0)),
                       name="branch7x7dbl_2")(bd)
        bd = BasicConv(c7, (1, 7), padding=((0, 0), (3, 3)),
                       name="branch7x7dbl_3")(bd)
        bd = BasicConv(c7, (7, 1), padding=((3, 3), (0, 0)),
                       name="branch7x7dbl_4")(bd)
        bd = BasicConv(192, (1, 7), padding=((0, 0), (3, 3)),
                       name="branch7x7dbl_5")(bd)
        bp = _avg_pool_nocount(x)
        bp = BasicConv(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv(192, (1, 1), name="branch3x3_1")(x)
        b3 = BasicConv(320, (3, 3), strides=2, name="branch3x3_2")(b3)
        b7 = BasicConv(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv(192, (1, 7), padding=((0, 0), (3, 3)),
                       name="branch7x7x3_2")(b7)
        b7 = BasicConv(192, (7, 1), padding=((3, 3), (0, 0)),
                       name="branch7x7x3_3")(b7)
        b7 = BasicConv(192, (3, 3), strides=2, name="branch7x7x3_4")(b7)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    pool_kind: str = "avg"   # E1 avg(count_include_pad=False), E2 max

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv(320, (1, 1), name="branch1x1")(x)
        b3 = BasicConv(384, (1, 1), name="branch3x3_1")(x)
        b3a = BasicConv(384, (1, 3), padding=((0, 0), (1, 1)),
                        name="branch3x3_2a")(b3)
        b3b = BasicConv(384, (3, 1), padding=((1, 1), (0, 0)),
                        name="branch3x3_2b")(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BasicConv(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv(384, (3, 3), padding=1, name="branch3x3dbl_2")(bd)
        bda = BasicConv(384, (1, 3), padding=((0, 0), (1, 1)),
                        name="branch3x3dbl_3a")(bd)
        bdb = BasicConv(384, (3, 1), padding=((1, 1), (0, 0)),
                        name="branch3x3dbl_3b")(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        if self.pool_kind == "avg":
            bp = _avg_pool_nocount(x)
        else:
            bp = nn.max_pool(x, (3, 3), strides=(1, 1),
                             padding=((1, 1), (1, 1)))
        bp = BasicConv(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3(nn.Module):
    """FID-variant InceptionV3. Input: NHWC float in [0,1], any HxW
    (resized to 299 inside). Returns (pool2048, spatial, logits)."""

    num_classes: int = 1008

    @nn.compact
    def __call__(self, x):
        b = x.shape[0]
        x = jax.image.resize(x, (b, 299, 299, x.shape[-1]), "bilinear")
        x = 2.0 * x - 1.0  # TF inception scaling

        x = BasicConv(32, (3, 3), strides=2, name="Conv2d_1a_3x3")(x)
        x = BasicConv(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv(64, (3, 3), padding=1, name="Conv2d_2b_3x3")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = BasicConv(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = BasicConv(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))

        x = InceptionA(32, name="Mixed_5b")(x)
        x = InceptionA(64, name="Mixed_5c")(x)
        x = InceptionA(64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, name="Mixed_6b")(x)
        x = InceptionC(160, name="Mixed_6c")(x)
        x = InceptionC(160, name="Mixed_6d")(x)
        # sFID spatial feature: the reference taps TF tensor
        # ``mixed_6/conv:0`` then keeps channels [:7]
        # (DDPM/evaluator.py:36,659-666). In the 2015-12-05 TF graph the
        # mixed blocks are named mixed..mixed_10, so ``mixed_6`` is the
        # THIRD 17x17 InceptionC block — torchvision/pytorch-fid
        # ``Mixed_6d`` — and ``mixed_6/conv`` is the ReLU of its 1x1
        # branch, which is FIRST in the block's concat. Its first 7
        # channels therefore equal the first 7 channels of the Mixed_6d
        # output (= the Mixed_6e INPUT), which is what we tap here.
        # Confirm against the 7.4390 sFID baseline on the first
        # real-weights run (tests/test_fid.py pins the tap location).
        spatial = x[..., :7].reshape(b, -1)
        x = InceptionC(192, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE("avg", name="Mixed_7b")(x)
        x = InceptionE("max", name="Mixed_7c")(x)

        pool = jnp.mean(x, axis=(1, 2))  # adaptive avg pool (1,1) → 2048
        logits = nn.Dense(self.num_classes, name="fc")(pool)
        return pool, spatial, jax.nn.softmax(logits, axis=-1)


def load_params(path: str):
    """Import pytorch-fid ``pt_inception-2015-12-05-*.pth`` weights."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    flat = {}
    for name, t in sd.items():
        v = np.asarray(t.numpy() if hasattr(t, "numpy") else t)
        parts = name.split(".")
        if parts[0] == "fc":
            if parts[1] == "weight":
                flat["fc/kernel"] = v.T
            else:
                flat["fc/bias"] = v
            continue
        mod = "/".join(parts[:-2]) + "/" + parts[-2]
        leaf = parts[-1]
        if parts[-2] == "conv":
            flat[mod + "/kernel"] = v.transpose(2, 3, 1, 0)
        elif parts[-2] == "bn":
            if leaf == "weight":
                flat[mod + "/scale"] = v
            elif leaf == "bias":
                flat[mod + "/bias"] = v
            elif leaf == "running_mean":
                flat[mod + "/mean"] = v
            elif leaf == "running_var":
                flat[mod + "/var"] = v
    from salun.utils.tree import tree_from_flat

    tree = tree_from_flat({k: jnp.asarray(v) for k, v in flat.items()})
    # split conv/bn params vs batch stats
    params, stats = {}, {}

    def walk(src, pdst, sdst):
        for k, v in src.items():
            if isinstance(v, dict):
                pk, sk = pdst.setdefault(k, {}), sdst.setdefault(k, {})
                walk(v, pk, sk)
            elif k in ("mean", "var"):
                sdst[k] = v
            else:
                pdst[k] = v

    walk(tree, params, stats)

    def prune_empty(d):
        return {
            k: prune_empty(v) if isinstance(v, dict) else v
            for k, v in d.items()
            if not (isinstance(v, dict) and not prune_empty(v))
        }

    return params, prune_empty(stats)


def make_feature_fn(params, batch_stats, batch_size: int = 64):
    """Jitted (pool, spatial, softmax) extractor over NHWC [0,1] images."""
    model = InceptionV3()

    # weights as jit args, not closures — closure capture embeds ~95 MB
    # of Inception weights as HLO literals on the TPU remote-compile path
    @jax.jit
    def _fn(p, s, x):
        return model.apply({"params": p, "batch_stats": s}, x)

    def fn(x):
        return _fn(params, batch_stats, x)

    def extract(images: np.ndarray):
        pools, spatials, smax = [], [], []
        for i in range(0, len(images), batch_size):
            p, s, m = fn(jnp.asarray(images[i : i + batch_size]))
            pools.append(np.asarray(p))
            spatials.append(np.asarray(s))
            smax.append(np.asarray(m))
        return (np.concatenate(pools), np.concatenate(spatials),
                np.concatenate(smax))

    return extract
