"""Wfisher (influence unlearning) golden parity vs the reference's torch
algorithm (salun/core/methods/wfisher.py vs
Classification/unlearn/Wfisher.py:47-199): the sample-weighted grad
combination v, the N=1000 woodfisher rank-1 inverse-HVP stream over a
batch-1 retain pass, and the final θ += α·H⁻¹v perturbation — end to end
on the matching torch/flax pair, final parameters compared leaf-wise.

Augmentation is disabled on both sides (cfg.imagenet_arch=True — the
torch oracle follows the reference's CIFAR branch, whose retain stream
reads the retain set; the reference's imagenet branch re-reads the
FORGET loader for retain_grad, Wfisher.py:136-147, a latent copy-paste
bug this port deliberately does not reproduce)."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import torch
import torch.nn as nn

from _tiny_pair import C, FlaxNet, TorchNet, flax_leaf, to_flax_layout, transport

from salun.core.methods.common import UnlearnConfig
from salun.core.methods.wfisher import Wfisher
from salun.core.train import TrainState
from salun.data.datasets import ArrayDataset
from salun.data.loader import BatchIterator


def _flat_grad_torch(tnet, data, label):
    loss = nn.CrossEntropyLoss()(tnet(data), label)
    gs = torch.autograd.grad(loss, list(tnet.parameters()))
    return torch.cat([g.reshape(-1) for g in gs])


def test_wfisher_matches_reference_end_to_end():
    torch.manual_seed(0)
    tnet = TorchNet().eval()
    params = transport(tnet)

    rng = np.random.RandomState(0)
    retain_imgs = rng.randint(0, 256, (8, 8, 8, 3), np.uint8)
    retain_lab = rng.randint(0, C, 8).astype(np.int64)
    forget_imgs = rng.randint(0, 256, (4, 8, 8, 3), np.uint8)
    forget_lab = rng.randint(0, C, 4).astype(np.int64)
    alpha = 0.2

    # ---- torch oracle (Wfisher.py:149-199, CIFAR branch, bs 4) ----
    def batches(imgs, labs, bs):
        for lo in range(0, len(imgs), bs):
            data = torch.from_numpy(
                imgs[lo:lo + bs].transpose(0, 3, 1, 2)).float() / 255.0
            yield data, torch.from_numpy(labs[lo:lo + bs])

    total = 0
    forget_grad = None
    for data, label in batches(forget_imgs, forget_lab, 4):
        g = _flat_grad_torch(tnet, data, label) * data.shape[0]
        forget_grad = g if forget_grad is None else forget_grad + g
        total += data.shape[0]
    total_2 = 0
    retain_grad = None
    for data, label in batches(retain_imgs, retain_lab, 4):
        g = _flat_grad_torch(tnet, data, label) * data.shape[0]
        retain_grad = g if retain_grad is None else retain_grad + g
        total_2 += data.shape[0]
    retain_grad = retain_grad * (total / ((total + total_2) * total_2))
    forget_grad = forget_grad / (total + total_2)
    v = forget_grad - retain_grad

    # woodfisher stream: batch-1 retain, unshuffled (Wfisher.py:47-69)
    N = 1000.0
    k_vec = v.clone()
    o_vec = None
    for data, label in batches(retain_imgs, retain_lab, 1):
        g = _flat_grad_torch(tnet, data, label)
        with torch.no_grad():
            if o_vec is None:
                o_vec = g.clone()
            else:
                tmp = torch.dot(o_vec, g)
                k_vec -= (torch.dot(k_vec, g) / (N + tmp)) * o_vec
                o_vec -= (tmp / (N + tmp)) * o_vec
    # apply_perturb (Wfisher.py:31-44): flat add in parameters() order
    curr = 0
    want = {}
    with torch.no_grad():
        for name, p in tnet.named_parameters():
            n = p.numel()
            want[name] = (p.view(-1) + alpha * k_vec[curr:curr + n]
                          ).view_as(p).numpy()
            curr += n

    # ---- ours ----
    loaders = {
        "retain": BatchIterator(
            ArrayDataset(retain_imgs, retain_lab.astype(np.int64), C),
            4, shuffle=False),
        "forget": BatchIterator(
            ArrayDataset(forget_imgs, forget_lab.astype(np.int64), C),
            4, shuffle=False),
    }
    state = TrainState.create({"params": params}, optax.sgd(0.1))
    cfg = UnlearnConfig(num_classes=C, alpha=alpha, imagenet_arch=True)
    new_state = Wfisher(loaders, FlaxNet(), state, cfg)

    for name in want:
        np.testing.assert_allclose(
            np.asarray(flax_leaf(new_state.params, name)),
            to_flax_layout(name, want[name]),
            rtol=2e-4, atol=1e-7, err_msg=name)
