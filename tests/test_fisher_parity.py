"""Fisher-unlearning golden parity vs the reference's torch loops
(salun/core/methods/fisher.py vs Classification/unlearn/fisher.py).

The deterministic estimator cores are compared bit-tight across the
matching torch/flax pair (tests/_tiny_pair.py):
- diagonal FIM from per-sample log-prob grads (fisher.py:8-33
  fisher_information_martix) vs our vmapped ``fisher_information``;
- the class-weighted squared-grad "hessian" (fisher.py:50-76) vs our
  ``_class_weighted_sq_grads`` fori_loop.
The subsequent noise injection is RNG-dependent and not comparable."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import torch
import torch.nn as nn

from _tiny_pair import C, FlaxNet, TorchNet, to_flax_layout, flax_leaf

from salun.core.methods.fisher import (
    _class_weighted_sq_grads, fisher_information,
)
from salun.core.train import TrainState


def _setup(seed):
    torch.manual_seed(seed)
    tnet = TorchNet().eval()
    from _tiny_pair import transport
    params = transport(tnet)
    rng = np.random.RandomState(seed)
    imgs = rng.rand(10, 3, 8, 8).astype(np.float32)
    labels = rng.randint(0, C, 10).astype(np.int64)
    return tnet, params, imgs, labels


def test_fisher_information_matches_reference_loop():
    tnet, params, imgs, labels = _setup(0)

    # reference: per-sample grad of log_softmax at the label, (g+eps)^2
    eps = 1e-8
    fa = {n: torch.zeros_like(p) for n, p in tnet.named_parameters()}
    total = 0
    for lo in (0, 5):  # two batches of 5
        data = torch.from_numpy(imgs[lo:lo + 5])
        lab = torch.from_numpy(labels[lo:lo + 5])
        preds = torch.log_softmax(tnet(data), dim=-1)
        for i in range(5):
            gs = torch.autograd.grad(preds[i][lab[i]], tnet.parameters(),
                                     retain_graph=True)
            for (n, _), d in zip(tnet.named_parameters(), gs):
                fa[n] += (d + eps) ** 2
        total += 5
    fa = {n: (v / total).numpy() for n, v in fa.items()}

    state = TrainState.create({"params": params}, optax.sgd(0.1))
    loader = [
        {"image": imgs[lo:lo + 5].transpose(0, 2, 3, 1),
         "label": labels[lo:lo + 5].astype(np.int32),
         "weight": np.ones(5, np.float32)}
        for lo in (0, 5)
    ]
    fim = fisher_information(FlaxNet(), state, loader, aug_key=None)
    for name in fa:
        np.testing.assert_allclose(
            np.asarray(flax_leaf(fim, name)),
            to_flax_layout(name, fa[name]),
            rtol=1e-4, atol=1e-9, err_msg=name)


def test_fisher_new_grad2_matches_reference_hessian():
    tnet, params, imgs, labels = _setup(1)
    loss_fn = nn.CrossEntropyLoss(reduction="mean")

    grad2 = {n: torch.zeros_like(p) for n, p in tnet.named_parameters()}
    n_batches = 0
    for lo in (0, 5):
        data = torch.from_numpy(imgs[lo:lo + 5])
        lab = torch.from_numpy(labels[lo:lo + 5])
        output = tnet(data)
        prob = torch.nn.functional.softmax(output, dim=-1).data
        for y in range(C):
            target = torch.empty_like(lab).fill_(y)
            loss = loss_fn(output, target)
            tnet.zero_grad()
            loss.backward(retain_graph=True)
            for n, p in tnet.named_parameters():
                grad2[n] += prob[:, y].mean() * p.grad.data.pow(2)
        n_batches += 1
    grad2 = {n: (v / n_batches).numpy() for n, v in grad2.items()}

    acc = jax.tree.map(lambda p: jnp.zeros_like(p, jnp.float32), params)
    for lo in (0, 5):
        img = jnp.asarray(imgs[lo:lo + 5].transpose(0, 2, 3, 1))
        sq = _class_weighted_sq_grads(FlaxNet(), params, {}, img, C)
        acc = jax.tree.map(jnp.add, acc, sq)
    ours = jax.tree.map(lambda a: a / 2, acc)

    for name in grad2:
        np.testing.assert_allclose(
            np.asarray(flax_leaf(ours, name)),
            to_flax_layout(name, grad2[name]),
            rtol=2e-4, atol=1e-11, err_msg=name)
