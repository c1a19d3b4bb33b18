"""Fisher-information based unlearning: ``fisher`` and ``fisher_new``.

Parity with Classification/unlearn/fisher.py:
- ``fisher`` (fisher.py:8-47): diagonal FIM over the retain set from
  *per-sample* gradients of log p(y_i|x_i) (squared, +eps, averaged), then
  add noise sqrt(alpha/FIM) clamped to 1e-3 (×10 for the final layer).
- ``fisher_new`` (fisher.py:50-115): per-class expected squared gradients of
  CE(output, y) weighted by softmax prob (the classic Fisher estimator),
  variance = alpha/(F+eps) with clamps and row-mean spreading, then resample
  weights ~ N(theta, var) with special-casing of the forgotten class row.

TPU design: per-sample gradients come from ``jax.vmap(jax.grad(...))`` —
native and batched on the MXU, instead of the reference's one-backward-per-
sample loop (fisher.py:20-27) which is O(batch) serialized backward passes.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

from salun.core.train import TrainState
from salun.data.loader import augment, to_float

from .common import UnlearnConfig


def _per_sample_logp_grads(model, params, batch_stats, img, label):
    """grad of log-softmax at the true label, per sample (vmapped)."""

    def one(params, x, y):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        out = model.apply(variables, x[None], train=False)
        return jax.nn.log_softmax(out[0])[y]

    return jax.vmap(jax.grad(one), in_axes=(None, 0, 0))(params, img, label)


def fisher_information(model, state: TrainState, loader, aug_key=None):
    """Diagonal FIM (fisher.py:8-33): mean over samples of (g+eps)^2.

    ``aug_key``: when given, each batch is crop+flip augmented on device —
    the reference's retain loader carries the marked train dataset's
    transform (dataset.py:24-31), so its FIM is estimated over augmented
    samples (model.eval)."""
    eps = 1e-8

    @jax.jit
    def acc_batch(acc, total, batch):
        img = to_float(batch["image"])
        if "aug_key" in batch:
            img = augment(batch["aug_key"], img)
        g = _per_sample_logp_grads(
            model, state.params, state.batch_stats, img, batch["label"]
        )
        w = batch["weight"]
        sq = jax.tree.map(
            lambda t: jnp.einsum(
                "b...,b->...", (t + eps) ** 2,
                w.astype(t.dtype),
            ),
            g,
        )
        acc = jax.tree.map(jnp.add, acc, sq)
        return acc, total + jnp.sum(w)

    acc = jax.tree.map(lambda p: jnp.zeros_like(p, jnp.float32), state.params)
    total = jnp.zeros((), jnp.float32)
    for batch in loader:
        batch = jax.tree.map(jnp.asarray, batch)
        if aug_key is not None:
            aug_key, k = jax.random.split(aug_key)
            batch = dict(batch, aug_key=k)
        acc, total = acc_batch(acc, total, batch)
    return jax.tree.map(lambda a: a / total, acc)


def fisher(loaders, model, state: TrainState, cfg: UnlearnConfig, mask=None,
           key=None):
    key = key if key is not None else jax.random.PRNGKey(cfg.seed)
    key, kf = jax.random.split(key)
    fim = fisher_information(model, state, loaders["retain"],
                             aug_key=None if cfg.imagenet_arch else kf)

    def add_noise(path, p, f, k):
        sigma = jnp.clip(jnp.sqrt(cfg.alpha / f), max=1e-3)
        noise = sigma * jax.random.normal(k, p.shape, jnp.float32)
        # final-layer boost (fisher.py:44): params whose last dim is the
        # class count get 10x noise
        if p.ndim >= 1 and p.shape[-1] == cfg.num_classes:
            noise = noise * 10.0
        return p + noise.astype(p.dtype)

    leaves, treedef = jax.tree.flatten(state.params)
    fleaves = jax.tree.leaves(fim)
    keys = jax.random.split(key, len(leaves))
    new_leaves = [
        add_noise(None, p, f, k) for p, f, k in zip(leaves, fleaves, keys)
    ]
    return state.replace(params=jax.tree.unflatten(treedef, new_leaves))


def _class_weighted_sq_grads(model, params, batch_stats, img, num_classes):
    """E_y~p [ (∇CE(out, y))² ] per batch (fisher.py:59-76 hessian)."""

    def ce_for_class(params, y):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        out = model.apply(variables, img, train=False)
        labels = jnp.full((img.shape[0],), y, jnp.int32)
        ll = jax.nn.log_softmax(out.astype(jnp.float32), axis=-1)
        return -jnp.take_along_axis(ll, labels[:, None], axis=-1).mean(), out

    acc = jax.tree.map(lambda p: jnp.zeros_like(p, jnp.float32), params)
    # prob of each class, averaged over batch — weights for the class sum
    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats
    probs = jax.nn.softmax(
        model.apply(variables, img, train=False).astype(jnp.float32), axis=-1
    ).mean(0)

    def body(y, acc):
        g, _ = jax.grad(ce_for_class, has_aux=True)(params, y)
        return jax.tree.map(lambda a, t: a + probs[y] * t**2, acc, g)

    return jax.lax.fori_loop(0, num_classes, body, acc)


def fisher_new(loaders, model, state: TrainState, cfg: UnlearnConfig,
               mask=None, key=None):
    key = key if key is not None else jax.random.PRNGKey(cfg.seed)
    loader = loaders["retain"]

    @jax.jit
    def acc_batch(acc, batch):
        img = to_float(batch["image"])
        if "aug_key" in batch:
            img = augment(batch["aug_key"], img)
        sq = _class_weighted_sq_grads(
            model, state.params, state.batch_stats, img, cfg.num_classes
        )
        return jax.tree.map(jnp.add, acc, sq)

    acc = jax.tree.map(lambda p: jnp.zeros_like(p, jnp.float32), state.params)
    n_batches = 0
    key, ka = jax.random.split(key)
    for batch in loader:
        batch = jax.tree.map(jnp.asarray, batch)
        if not cfg.imagenet_arch:
            ka, k = jax.random.split(ka)
            batch = dict(batch, aug_key=k)
        acc = acc_batch(acc, batch)
        n_batches += 1
    grad2 = jax.tree.map(lambda a: a / max(n_batches, 1), acc)

    special_forget = (
        (cfg.num_indexes_to_replace == 4500 and cfg.dataset == "cifar10")
        or (cfg.num_indexes_to_replace == 450 and cfg.dataset == "cifar100")
    )

    def resample(p, g2, k):
        var = 1.0 / (g2 + 1e-8)
        var = jnp.clip(var, max=1e3)
        is_classifier = p.ndim >= 1 and p.shape[-1] == cfg.num_classes
        if is_classifier:
            var = jnp.clip(var, max=1e2)
        var = cfg.alpha * var
        if p.ndim > 1:
            # spread row means (fisher.py:86-87); our kernels are
            # [..., in, out] so average over all non-output axes
            var = jnp.mean(var, axis=tuple(range(p.ndim - 1)), keepdims=True)
            var = jnp.broadcast_to(var, p.shape)
        mu = p.astype(jnp.float32)
        if is_classifier and special_forget and cfg.class_to_replace >= 0:
            mu = mu.at[..., cfg.class_to_replace].set(0.0)
            var = var.at[..., cfg.class_to_replace].set(1e-4)
        if is_classifier or p.ndim == 1:
            var = var * 10.0  # last layer / batchnorm boost (fisher.py:100-106)
        return (mu + jnp.sqrt(var) * jax.random.normal(k, p.shape)).astype(p.dtype)

    leaves, treedef = jax.tree.flatten(state.params)
    g2_leaves = jax.tree.leaves(grad2)
    keys = jax.random.split(key, len(leaves))
    new = [resample(p, g, k) for p, g, k in zip(leaves, g2_leaves, keys)]
    return state.replace(params=jax.tree.unflatten(treedef, new))
