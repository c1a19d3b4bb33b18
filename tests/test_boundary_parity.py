"""boundary_shrink golden parity vs the reference's torch loop
(salun/core/methods/boundary.py vs Classification/unlearn/boundary_sh.py):
FGSM on a frozen copy against the TRUE forget label (bound 0.1,
clamp+255-grid discretize), relabel with the frozen model's prediction on
the adversarial input, SGD(momentum, weight-decay) on the live model —
two epochs end-to-end on the matching torch/flax pair, final params
compared leaf-wise. Augmentation disabled on both sides
(cfg.imagenet_arch=True)."""

import copy

import numpy as np
import torch
import torch.nn as nn

from _tiny_pair import C, FlaxNet, TorchNet, flax_leaf, to_flax_layout, transport

from salun.core.methods.boundary import boundary_shrink
from salun.core.methods.common import UnlearnConfig, make_unlearn_optimizer
from salun.core.train import TrainState
from salun.data.datasets import ArrayDataset
from salun.data.loader import BatchIterator

LR, EPOCHS, BS = 0.05, 2, 4


def test_boundary_shrink_matches_reference_loop():
    torch.manual_seed(0)
    tnet = TorchNet()
    params = transport(tnet)

    rng = np.random.RandomState(1)
    imgs = rng.randint(0, 256, (8, 8, 8, 3), np.uint8)
    labs = rng.randint(0, C, 8).astype(np.int64)

    # ---- torch oracle (boundary_sh.py:39-52, 79-109, 135-141) ----
    test_model = copy.deepcopy(tnet).eval()
    opt = torch.optim.SGD(tnet.parameters(), lr=LR, momentum=0.9,
                          weight_decay=5e-4)
    criterion = nn.CrossEntropyLoss()
    bound = 0.1
    for _ in range(EPOCHS):
        for lo in range(0, 8, BS):
            image = torch.from_numpy(
                imgs[lo:lo + BS].transpose(0, 3, 1, 2)).float() / 255.0
            target = torch.from_numpy(labs[lo:lo + BS])
            # FGSM_perturb on the frozen copy with the TRUE label
            x_adv = image.detach().clone().requires_grad_(True)
            loss = criterion(test_model(x_adv), target)
            loss.backward()
            x_adv = x_adv + x_adv.grad.data.detach().sign() * bound
            x_adv = torch.round(torch.clamp(x_adv, 0.0, 1.0) * 255) / 255
            adv_label = torch.argmax(test_model(x_adv.detach()), dim=1)

            loss = criterion(tnet(image), adv_label)
            opt.zero_grad()
            loss.backward()
            opt.step()
    want = {n: p.detach().numpy() for n, p in tnet.named_parameters()}

    # ---- ours ----
    loaders = {"forget": BatchIterator(
        ArrayDataset(imgs, labs, C), BS, shuffle=False)}
    cfg = UnlearnConfig(num_classes=C, unlearn_lr=LR, unlearn_epochs=EPOCHS,
                        imagenet_arch=True)
    state = TrainState.create(
        {"params": params}, make_unlearn_optimizer(cfg, 2))
    new_state = boundary_shrink(loaders, FlaxNet(), state, cfg)

    for name in want:
        np.testing.assert_allclose(
            np.asarray(flax_leaf(new_state.params, name)),
            to_flax_layout(name, want[name]),
            rtol=2e-4, atol=1e-6, err_msg=name)
