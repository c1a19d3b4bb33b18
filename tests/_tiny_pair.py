"""A matching torch/flax tiny conv-net pair + weight transport, shared by
the golden-parity tests (pruner, fisher). Underscore-prefixed: not
collected by pytest."""

import flax.linen as fnn
import jax.numpy as jnp
import torch
import torch.nn as nn

C = 5  # classes


class TorchNet(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 4, 3, padding=1)
        self.conv2 = nn.Conv2d(4, 8, 3, padding=1)
        self.fc = nn.Linear(8, C)

    def forward(self, x):
        h = torch.relu(self.conv1(x))
        h = torch.relu(self.conv2(h))
        return self.fc(h.mean(dim=(2, 3)))


class FlaxNet(fnn.Module):
    @fnn.compact
    def __call__(self, x, train: bool = False):
        h = fnn.relu(fnn.Conv(4, (3, 3), padding=1, name="conv1")(x))
        h = fnn.relu(fnn.Conv(4 * 2, (3, 3), padding=1, name="conv2")(h))
        return fnn.Dense(C, name="fc")(h.mean(axis=(1, 2)))


def transport(tnet):
    """torch state → flax params pytree (OIHW→HWIO, [O,I]→[I,O]).

    Copies defensively: ``.detach().numpy()`` aliases the torch buffer
    and jax's CPU backend can alias numpy memory, so without the copy an
    in-place torch ``opt.step()`` after transport would silently mutate
    the jax params too."""
    sd = {k: v.detach().numpy().copy() for k, v in tnet.state_dict().items()}
    return {
        "conv1": {"kernel": jnp.asarray(sd["conv1.weight"].transpose(
            2, 3, 1, 0)), "bias": jnp.asarray(sd["conv1.bias"])},
        "conv2": {"kernel": jnp.asarray(sd["conv2.weight"].transpose(
            2, 3, 1, 0)), "bias": jnp.asarray(sd["conv2.bias"])},
        "fc": {"kernel": jnp.asarray(sd["fc.weight"].T),
               "bias": jnp.asarray(sd["fc.bias"])},
    }


# (torch named parameter, flax tree path, axis permutation to flax layout)
PARAM_MAP = [
    ("conv1.weight", ("conv1", "kernel"), (2, 3, 1, 0)),
    ("conv1.bias", ("conv1", "bias"), None),
    ("conv2.weight", ("conv2", "kernel"), (2, 3, 1, 0)),
    ("conv2.bias", ("conv2", "bias"), None),
    ("fc.weight", ("fc", "kernel"), (1, 0)),
    ("fc.bias", ("fc", "bias"), None),
]


def to_flax_layout(name: str, arr):
    """Transpose a torch-layout numpy array to the flax layout."""
    for tname, _, perm in PARAM_MAP:
        if tname == name:
            return arr.transpose(perm) if perm else arr
    raise KeyError(name)


def flax_leaf(tree, name: str):
    for tname, path, _ in PARAM_MAP:
        if tname == name:
            node = tree
            for p in path:
                node = node[p]
            return node
    raise KeyError(name)
