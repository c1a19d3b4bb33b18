"""Pruner golden parity vs torch (salun/core/pruner.py).

Oracles are torch's own ``torch.nn.utils.prune.global_unstructured`` (the
exact library call the reference makes, pruner/utils.py:23-35, 289-316)
plus the reference's score formulas re-computed in torch in-test (SNIP
|grad|, utils.py:208-227; GraSP exact double-backward HVP with the /200
temperature, utils.py:229-245; SynFlow linearize→ones-input→|g·w| with
the iterative-100 schedule, utils.py:246-316). Weights are transported
between a matching torch/flax conv-net pair, so any divergence in
scores, prune counts, or composition semantics fails bit-level mask
comparison."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
import torch
import torch.nn as nn
import torch.nn.utils.prune as tprune

from _tiny_pair import C, FlaxNet, TorchNet, transport as _transport

from salun.core import pruner


def _torch_masks_to_flax(tnet):
    return {
        name: np.asarray(getattr(tnet, name).weight_mask.detach().numpy()
                         .transpose(2, 3, 1, 0))
        for name in ("conv1", "conv2")
    }


def _assert_masks_equal(flax_mask, torch_masks):
    for name in ("conv1", "conv2"):
        np.testing.assert_array_equal(
            np.asarray(flax_mask[name]["kernel"]), torch_masks[name],
            err_msg=name)
    # non-conv leaves untouched
    assert float(jnp.min(flax_mask["fc"]["kernel"])) == 1.0


def _convs(tnet):
    return [(tnet.conv1, "weight"), (tnet.conv2, "weight")]


@pytest.mark.parametrize("px", [0.3, 0.5])
def test_l1_global_prune_matches_torch(px):
    torch.manual_seed(0)
    tnet = TorchNet()
    params = _transport(tnet)
    tprune.global_unstructured(_convs(tnet),
                               pruning_method=tprune.L1Unstructured,
                               amount=px)
    mask = pruner.global_l1_prune(params, px)
    _assert_masks_equal(mask, _torch_masks_to_flax(tnet))


def test_repeated_l1_prune_composes_like_torch():
    """Iterative pruning (FT_prune_bi / GA_prune): torch's amount is a
    fraction of the REMAINING weights; two 0.3 rounds ⇒ 51% pruned, and
    the second round's selection must match elementwise."""
    torch.manual_seed(1)
    tnet = TorchNet()
    params = _transport(tnet)
    mask = None
    for _ in range(2):
        tprune.global_unstructured(_convs(tnet),
                                   pruning_method=tprune.L1Unstructured,
                                   amount=0.3)
        mask = pruner.global_l1_prune(params, 0.3, mask)
    _assert_masks_equal(mask, _torch_masks_to_flax(tnet))
    sp = pruner.check_sparsity(params, mask)
    assert abs(sp - 49.0) < 1.5, sp  # ~51% pruned of conv weights


def _ce_loss_grad(model, temperature=1.0):
    def loss(p, batch):
        logits = model.apply({"params": p}, batch["x"]) / temperature
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, batch["y"]).mean()
    return jax.grad(loss)


def test_snip_scores_and_mask_match_torch():
    """Reference SNIP is |∂CE/∂w| alone (utils.py:208-227)."""
    torch.manual_seed(2)
    tnet = TorchNet()
    params = _transport(tnet)
    x = torch.randn(6, 3, 8, 8)
    y = torch.randint(0, C, (6,))

    loss = nn.CrossEntropyLoss()(tnet(x), y)
    loss.backward()
    t_scores = {(m, "weight"): m.weight.grad.data.abs()
                for m, _ in _convs(tnet)}

    batch = {"x": jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
             "y": jnp.asarray(y.numpy())}
    scores = pruner.snip_scores(_ce_loss_grad(FlaxNet()), params, batch)
    for name, (m, _) in zip(("conv1", "conv2"), _convs(tnet)):
        np.testing.assert_allclose(
            np.asarray(scores[name]["kernel"]),
            t_scores[(m, "weight")].numpy().transpose(2, 3, 1, 0),
            rtol=1e-4, atol=1e-6, err_msg=name)

    tprune.global_unstructured(t_scores.keys(),
                               pruning_method=tprune.L1Unstructured,
                               amount=0.4, importance_scores=t_scores)
    mask = pruner.prune_by_scores(params, scores, 0.4)
    _assert_masks_equal(mask, _torch_masks_to_flax(tnet))


def test_grasp_scores_match_torch():
    """Reference GraSP: -w ⊙ H·ĝ via exact double backward on
    CE(model(x)/200, y) (utils.py:229-245)."""
    torch.manual_seed(3)
    tnet = TorchNet()
    params = _transport(tnet)
    x = torch.randn(6, 3, 8, 8)
    y = torch.randint(0, C, (6,))

    loss = nn.CrossEntropyLoss()(tnet(x) / 200, y)
    gs = torch.autograd.grad(loss, [p for p in tnet.parameters()],
                             create_graph=True)
    t = sum((g * g.data).sum() for g in gs)
    t.backward()
    t_scores = {(m, "weight"): (-m.weight.data * m.weight.grad.data)
                for m, _ in _convs(tnet)}

    batch = {"x": jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
             "y": jnp.asarray(y.numpy())}
    grad_fn = _ce_loss_grad(FlaxNet(), temperature=pruner.GRASP_TEMPERATURE)
    scores = pruner.grasp_scores(grad_fn, params, batch)
    for name, (m, _) in zip(("conv1", "conv2"), _convs(tnet)):
        np.testing.assert_allclose(
            np.asarray(scores[name]["kernel"]),
            t_scores[(m, "weight")].numpy().transpose(2, 3, 1, 0),
            rtol=2e-3, atol=1e-10, err_msg=name)


def test_synflow_iterative_matches_torch():
    """Reference SynFlow: linearize(|w|) → ones input → |g ⊙ w| scores,
    pruned iteratively with per-round ratio 1-(1-r)^(1/n)
    (utils.py:246-316)."""
    torch.manual_seed(4)
    tnet = TorchNet()
    params = _transport(tnet)
    rate, iters = 0.5, 10
    each = 1 - (1 - rate) ** (1 / iters)

    for _ in range(iters):
        # linearize: all params -> |param| (signs restored after scoring)
        signs = {k: torch.sign(v) for k, v in tnet.state_dict().items()}
        with torch.no_grad():
            for k, v in tnet.state_dict().items():
                v.abs_()
        tnet.zero_grad()
        out = tnet(torch.ones(1, 3, 8, 8))
        torch.sum(out).backward()
        t_scores = {}
        for m, _ in _convs(tnet):
            g = (m.weight_orig.grad if hasattr(m, "weight_orig")
                 else m.weight.grad)
            t_scores[(m, "weight")] = (g.data * m.weight.data).abs()
        with torch.no_grad():
            for k, v in tnet.state_dict().items():
                v.mul_(signs[k])
        tprune.global_unstructured(t_scores.keys(),
                                   pruning_method=tprune.L1Unstructured,
                                   amount=each, importance_scores=t_scores)

    mask = pruner.synflow_prune(FlaxNet(), params, rate, (1, 8, 8, 3),
                                iterations=iters)
    _assert_masks_equal(mask, _torch_masks_to_flax(tnet))
