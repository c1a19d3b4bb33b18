"""Influence unlearning (IU / Wfisher).

Parity with Classification/unlearn/Wfisher.py:47-199:
- average gradient of CE over forget and retain sets (sample-weighted),
  combined as v = forget_grad/(Nf+Nr) − retain_grad·Nf/((Nf+Nr)·Nr)
  (Wfisher.py:171-173);
- woodfisher: stream batch-1 retain gradients g_t, maintaining
  k ← k − (⟨k,g⟩/(N+⟨o,g⟩))·o and o ← o − (⟨o,g⟩/(N+⟨o,g⟩))·o with N=1000
  (Wfisher.py:47-69) — a rank-1 inverse-Hessian-vector refinement;
- apply θ += alpha · H⁻¹v (optionally masked) (Wfisher.py:31-44,197).

TPU design: all vector algebra happens on flat device buffers via
``ravel_pytree``; the gradient streams are jitted; no host round-trips
inside the loops.

Deliberate divergence: the reference's imagenet branch accumulates
``retain_grad`` by iterating the FORGET loader a second time
(Wfisher.py:136-147 — a latent copy-paste bug; the CIFAR branch at
:149-170 reads the retain set). This port always reads the retain set.
End-to-end golden parity vs the (correct) reference algorithm:
tests/test_wfisher_parity.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

from salun.core.train import TrainState, cross_entropy
from salun.data.loader import augment, to_float

from .common import UnlearnConfig


def _make_flat_grad(model, batch_stats, unravel):
    @jax.jit
    def flat_grad(params_flat, batch):
        img = to_float(batch["image"])
        if "aug_key" in batch:
            # reference parity: every Wfisher gradient stream reads the
            # marked train dataset through its train transform
            # (random crop+flip, dataset.py:24-31)
            img = augment(batch["aug_key"], img)

        def loss_fn(pf):
            params = unravel(pf)
            variables = {"params": params}
            if batch_stats:
                variables["batch_stats"] = batch_stats
            out = model.apply(variables, img, train=False)
            return cross_entropy(out, batch["label"], batch.get("weight"))

        return jax.grad(loss_fn)(params_flat)

    return flat_grad


def _sum_weighted_grads(flat_grad, params_flat, loader, aug_key=None):
    total = 0.0
    acc = jnp.zeros_like(params_flat)
    for batch in loader:
        batch = jax.tree.map(jnp.asarray, batch)
        if aug_key is not None:
            aug_key, k = jax.random.split(aug_key)
            batch = dict(batch, aug_key=k)
        n = float(batch["weight"].sum())
        acc = acc + flat_grad(params_flat, batch) * n
        total += n
    return acc, total


def Wfisher(loaders, model, state: TrainState, cfg: UnlearnConfig, mask=None,
            key=None):
    key = key if key is not None else jax.random.PRNGKey(cfg.seed)
    params_flat, unravel = ravel_pytree(state.params)
    params_flat = params_flat.astype(jnp.float32)
    flat_grad = _make_flat_grad(model, state.batch_stats, unravel)

    do_aug = not cfg.imagenet_arch
    key, kf, kr, ks = jax.random.split(key, 4)
    forget_sum, n_f = _sum_weighted_grads(
        flat_grad, params_flat, loaders["forget"],
        aug_key=kf if do_aug else None)
    retain_sum, n_r = _sum_weighted_grads(
        flat_grad, params_flat, loaders["retain"],
        aug_key=kr if do_aug else None)

    retain_grad = retain_sum * (n_f / ((n_f + n_r) * n_r))
    forget_grad = forget_sum / (n_f + n_r)
    v = forget_grad - retain_grad

    # woodfisher inverse-HVP over a batch-1 retain stream (Wfisher.py:47-69)
    N = 1000.0

    @jax.jit
    def wf_step(carry, g):
        k_vec, o_vec, first = carry
        tmp = jnp.dot(o_vec, g)
        denom = N + tmp
        k_new = k_vec - (jnp.dot(k_vec, g) / denom) * o_vec
        o_new = o_vec - (tmp / denom) * o_vec
        k_vec = jnp.where(first, k_vec, k_new)
        o_vec = jnp.where(first, g, o_new)
        return (k_vec, o_vec, jnp.zeros((), bool)), None

    k_vec = v
    o_vec = jnp.zeros_like(v)
    first = jnp.ones((), bool)
    count = 0
    # batch-1 stream, unshuffled (Wfisher.py:104-106)
    ds = loaders["retain"].ds
    for i in range(len(ds)):
        batch = {
            "image": jnp.asarray(ds.data[i : i + 1]),
            "label": jnp.asarray(ds.targets[i : i + 1].astype("int32")),
            "weight": jnp.ones((1,), jnp.float32),
        }
        if do_aug:
            ks, k1 = jax.random.split(ks)
            batch["aug_key"] = k1
        g = flat_grad(params_flat, batch)
        (k_vec, o_vec, first), _ = wf_step((k_vec, o_vec, first), g)
        count += 1
        if count > int(N):  # Wfisher.py:67-68 early exit
            break

    perturb = cfg.alpha * k_vec
    if mask is not None:
        mask_flat, _ = ravel_pytree(mask)
        perturb = perturb * mask_flat
    new_params = unravel(params_flat + perturb)
    new_params = jax.tree.map(
        lambda n, p: n.astype(p.dtype), new_params, state.params
    )
    return state.replace(params=new_params)
