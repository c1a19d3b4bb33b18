"""Model construction / forward-shape / param-count sanity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from salun.models import create_model, model_dict
from salun.utils.tree import tree_size


@pytest.mark.parametrize("arch", sorted(model_dict))
def test_forward_shapes(arch, key):
    model = create_model(arch, num_classes=10)
    x = jnp.zeros((2, 32, 32, 3), jnp.float32)
    variables = model.init(key, x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.shape == (2, 10)


def test_resnet18_param_count(key):
    # torchvision CIFAR resnet18 ≈ 11.17M params (conv/fc/bn affine).
    model = create_model("resnet18", num_classes=10)
    v = model.init(key, jnp.zeros((1, 32, 32, 3)), train=False)
    n = tree_size(v["params"])
    assert 11.1e6 < n < 11.3e6, n


def test_resnet20s_param_count(key):
    # ResNet-20s ≈ 0.27M (ResNets.py header table)
    model = create_model("resnet20s", num_classes=10)
    v = model.init(key, jnp.zeros((1, 32, 32, 3)), train=False)
    n = tree_size(v["params"])
    assert 0.25e6 < n < 0.30e6, n


def test_batchstats_update(key):
    model = create_model("resnet18", num_classes=10)
    x = jax.random.uniform(key, (4, 32, 32, 3))
    v = model.init(key, x, train=False)
    out, mutated = model.apply(v, x, train=True, mutable=["batch_stats"])
    # running stats must actually change in train mode
    before = jax.tree.leaves(v["batch_stats"])
    after = jax.tree.leaves(mutated["batch_stats"])
    assert any(
        not np.allclose(np.asarray(b), np.asarray(a)) for b, a in zip(before, after)
    )


def test_imagenet_stem_shapes(key):
    model = create_model("resnet50", num_classes=100, imagenet=True)
    x = jnp.zeros((1, 224, 224, 3))
    v = model.init(key, x, train=False)
    out = model.apply(v, x, train=False)
    assert out.shape == (1, 100)
