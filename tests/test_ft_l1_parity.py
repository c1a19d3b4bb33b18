"""FT_l1 / GA step golden parity vs the reference's torch loop
(salun/core/train.py::make_train_step with l1_coeff vs
Classification/unlearn/FT.py:115-140 and GA.py): CE ± α(t)·‖θ‖₁ with the
linearly-decaying l1 coefficient (α·(1-epoch/(E-no_l1)) while
epoch < E-no_l1, else 0) and momentum-SGD, trajectory compared leaf-wise
over enough epochs to cross the coefficient breakpoints. Augmentation is
off on both sides (it is bit-tested separately,
tests/test_aux.py::test_augment_matmul_matches_dynamic_slice)."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn as nn

from _tiny_pair import C, FlaxNet, TorchNet, flax_leaf, to_flax_layout, transport

from salun.core import masked_opt
from salun.core.train import TrainState, make_train_step

LR, ALPHA, EPOCHS, NO_L1, BS = 0.05, 1e-3, 4, 1, 4


def _run_torch(tnet, imgs, labs, loss_sign, with_l1):
    opt = torch.optim.SGD(tnet.parameters(), lr=LR, momentum=0.9,
                          weight_decay=5e-4)
    criterion = nn.CrossEntropyLoss()
    for epoch in range(EPOCHS):
        if epoch < EPOCHS - NO_L1:
            current_alpha = ALPHA * (1 - epoch / (EPOCHS - NO_L1))
        else:
            current_alpha = 0
        for lo in range(0, len(imgs), BS):
            image = torch.from_numpy(
                imgs[lo:lo + BS].transpose(0, 3, 1, 2)).float() / 255.0
            target = torch.from_numpy(labs[lo:lo + BS])
            loss = loss_sign * criterion(tnet(image), target)
            if with_l1:
                l1 = torch.linalg.norm(
                    torch.cat([p.reshape(-1) for p in tnet.parameters()]),
                    ord=1)
                loss = loss + current_alpha * l1
            opt.zero_grad()
            loss.backward()
            opt.step()
    return {n: p.detach().numpy() for n, p in tnet.named_parameters()}


def _run_ours(params, imgs, labs, loss_sign, with_l1):
    steps_per_epoch = len(imgs) // BS
    tx = masked_opt.sgd(LR, 0.9, 5e-4)
    l1_coeff = None
    if with_l1:
        e_l1 = EPOCHS - NO_L1

        def l1_coeff(step):
            epoch = step // steps_per_epoch
            return jnp.where(epoch < e_l1,
                             ALPHA * (1.0 - epoch / e_l1), 0.0)

    step = make_train_step(FlaxNet(), tx, use_augment=False,
                           loss_sign=loss_sign, l1_coeff=l1_coeff,
                           num_classes=C)
    state = TrainState.create({"params": params}, tx)
    for _ in range(EPOCHS):
        for lo in range(0, len(imgs), BS):
            batch = {
                "image": jnp.asarray(imgs[lo:lo + BS]),
                "label": jnp.asarray(labs[lo:lo + BS].astype(np.int32)),
                "weight": jnp.ones((BS,), jnp.float32),
            }
            state, _ = step(state, batch, jax.random.PRNGKey(0))
    return state.params


def _check(loss_sign, with_l1, seed):
    torch.manual_seed(seed)
    tnet = TorchNet()
    params = transport(tnet)
    rng = np.random.RandomState(seed)
    imgs = rng.randint(0, 256, (8, 8, 8, 3), np.uint8)
    labs = rng.randint(0, C, 8).astype(np.int64)
    want = _run_torch(tnet, imgs, labs, loss_sign, with_l1)
    got = _run_ours(params, imgs, labs, loss_sign, with_l1)
    for name in want:
        np.testing.assert_allclose(
            np.asarray(flax_leaf(got, name)),
            to_flax_layout(name, want[name]),
            rtol=2e-4, atol=1e-6, err_msg=name)


def test_ft_l1_decay_trajectory_matches_torch():
    _check(loss_sign=1.0, with_l1=True, seed=0)


def test_ga_ascent_trajectory_matches_torch():
    _check(loss_sign=-1.0, with_l1=False, seed=1)
