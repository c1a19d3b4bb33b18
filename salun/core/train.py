"""Shared classification trainer (jitted, mesh-shardable).

Covers the reference's trainer layer (Classification/trainer/train.py:31-133,
trainer/val.py:6-72) and the epoch/optimizer scaffolding of
``@iterative_unlearn`` (unlearn/impl.py:54-127):

- SGD(momentum 0.9, wd 5e-4) with MultiStepLR(γ=0.1) or cosine-with-warmup
  (impl.py:75-97, main_train.py:66-84);
- per-epoch training with optional gradient masking and l1 regularization
  (train.py:58-61, 88-95);
- top-1 validation (val.py).

TPU design: one jitted ``train_step`` (donated state; augmentation + loss +
backward + masked optimizer fused into a single XLA program), batches arrive
as uint8 and are normalized on device. ``train_with_rewind`` — declared but
missing in the reference (trainer/__init__.py:1, a latent ImportError) — is
provided here for the pruners that need it.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from salun.data.loader import augment, to_float
from salun.utils.tree import tree_l1


class TrainState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray

    @classmethod
    def create(cls, variables, tx):
        params = variables["params"]
        return cls(
            params=params,
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(params),
            step=jnp.zeros((), jnp.int32),
        )

    def variables(self):
        v = {"params": self.params}
        if self.batch_stats:
            v["batch_stats"] = self.batch_stats
        return v


def cross_entropy(logits, labels, weight=None):
    """Mean CE over valid rows (parity: nn.CrossEntropyLoss mean reduction)."""
    ll = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(ll, labels[:, None], axis=-1)[:, 0]
    if weight is None:
        return nll.mean()
    return jnp.sum(nll * weight) / jnp.maximum(jnp.sum(weight), 1.0)


def multistep_lr(base_lr: float, milestones_epochs, steps_per_epoch: int,
                 gamma: float = 0.1):
    """MultiStepLR stepped per epoch (impl.py:95-97, main_train.py:82-84)."""
    boundaries = {int(m) * steps_per_epoch: gamma for m in milestones_epochs}
    return optax.piecewise_constant_schedule(base_lr, boundaries)


def cosine_warmup_lr(base_lr: float, warmup_epochs: int, total_epochs: int,
                     steps_per_epoch: int):
    """Per-epoch cosine with linear warmup (impl.py:76-92, main_train.py:66-80).

    The reference's lambda uses *epoch* granularity; we reproduce that by
    flooring the step to an epoch index.
    """
    warmup = max(int(warmup_epochs), 0)

    def sched(step):
        epoch = step // steps_per_epoch
        warm = (epoch + 1) / jnp.maximum(warmup, 1)
        prog = (epoch - warmup) / jnp.maximum(total_epochs - warmup, 1)
        cos = 0.5 * (1.0 + jnp.cos(jnp.pi * prog))
        return base_lr * jnp.where(epoch < warmup, warm, cos)

    return sched


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    *,
    use_augment: bool = True,
    l1_coeff: Optional[Callable] = None,
    loss_sign: float = 1.0,
    random_labels: bool = False,
    num_classes: int = 10,
):
    """Build the jitted train step.

    ``loss_sign=-1`` gives gradient ascent (unlearn/GA.py:76). ``random_labels``
    resamples targets uniformly each step (the CIFAR-10/SVHN RL path,
    unlearn/RL.py:123-125). ``l1_coeff(step)`` adds α‖θ‖₁ (FT_l1/GA_l1).
    """

    @partial(jax.jit, donate_argnums=0)
    def step(state: TrainState, batch, key):
        ka, kl = jax.random.split(key)
        img = to_float(batch["image"])
        if use_augment:
            # cast to the model's compute dtype BEFORE augmenting: crop +
            # flip are pure selection, so cast-then-augment equals
            # augment-then-cast bitwise — but bf16 selection runs on the
            # native single-pass MXU path while f32 needs the 6-pass
            # HIGHEST einsum (see data/loader.py::augment). fp32 recipes
            # keep the exact HIGHEST path unchanged.
            img = augment(ka, img.astype(getattr(model, "dtype", img.dtype)))
        label = batch["label"]
        if random_labels:
            label = jax.random.randint(kl, label.shape, 0, num_classes)
        weight = batch.get("weight")

        def loss_fn(params):
            out, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                img, train=True, mutable=["batch_stats"],
            )
            loss = loss_sign * cross_entropy(out, label, weight)
            if l1_coeff is not None:
                loss = loss + l1_coeff(state.step) * tree_l1(params)
            return loss, (out, mutated["batch_stats"])

        (loss, (logits, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        acc = weighted_accuracy(logits, label, weight)
        new_state = state.replace(
            params=new_params, batch_stats=new_bs,
            opt_state=new_opt, step=state.step + 1,
        )
        return new_state, {"loss": loss, "acc": acc}

    return step


_EPOCH_SCANS = None  # lazily-created WeakKeyDictionary: step fn → runner


def _epoch_scan_for(step):
    global _EPOCH_SCANS
    import weakref

    if _EPOCH_SCANS is None:
        _EPOCH_SCANS = weakref.WeakKeyDictionary()
    run = _EPOCH_SCANS.get(step)
    if run is None:

        @partial(jax.jit, donate_argnums=0)
        def run(state, stacked, key):
            def body(carry, batch):
                st, k = carry
                k, sub = jax.random.split(k)
                st, m = step(st, batch, sub)
                return (st, k), m

            (state, key), ms = jax.lax.scan(body, (state, key), stacked)
            return state, jax.tree.map(lambda x: x[-1], ms), key

        try:
            _EPOCH_SCANS[step] = run
        except TypeError:
            pass
    return run


# Fast-path cap: stacking an epoch on device costs one host copy + HBM for
# the whole set (CIFAR train = 153 MB — fine; ImageNet would be ~200 GB —
# stream those). Overridable for constrained environments.
SCAN_EPOCH_MAX_BYTES = int(
    __import__("os").environ.get("SALUN_SCAN_EPOCH_MAX_BYTES", 2 << 30))


def _stack_epoch(loader):
    """The scan fast-path guard shared by :func:`run_epoch` /
    :func:`run_epoch_folded`: returns ``(stacked, loader)`` where
    ``stacked`` is the device-stacked epoch dict when the fast path
    applies (in-memory ``BatchIterator``, uniform shapes — final batch
    padded with weight-0 rows — and under the stacking cap) and ``None``
    otherwise; ``loader`` comes back materialized if it was consumed."""
    import numpy as np

    from salun.data.loader import BatchIterator

    scan_ok = (isinstance(loader, BatchIterator)
               and loader.ds.data.nbytes <= SCAN_EPOCH_MAX_BYTES
               and len(loader) >= 2)
    if not scan_ok:
        return None, loader
    batches = list(loader)
    if len({b["image"].shape for b in batches}) != 1:
        # non-uniform (pad_final disabled): stream the materialized list
        return None, batches
    from salun.dist import context as dist_ctx

    # dim 0 is the step axis; the batch axis (dim 1) shards over an
    # active --dp mesh (salun.dist.context)
    stacked = dist_ctx.ingest(
        {k: np.stack([b[k] for b in batches]) for k in batches[0]}, dim=1)
    return stacked, batches


def run_epoch(step, state, loader, key):
    """Run the jitted ``step`` over one epoch of ``loader``.

    TPU fast path: when the loader is an in-memory ``BatchIterator`` (all
    batches uniform-shape by construction — final batch padded with
    weight-0 rows) and the epoch fits the stacking cap, the whole epoch
    executes as ONE dispatched ``lax.scan`` over device-stacked batches —
    per-batch dispatch latency, the dominant host cost on a remote
    backend, disappears (measured: 19.0k vs 14.6k img/s on the ResNet-18
    RL recipe, docs/BENCHMARKS.md). The PRNG key is split once per step in
    both paths, so the two paths consume identical randomness; numerics
    agree to float tolerance (the scan body is a different XLA program, so
    last-ulp reduction differences can occur and are amplified by
    BatchNorm — tests/test_aux.py::test_run_epoch_scan_matches_loop).

    Returns ``(state, last_metrics, key)``.
    """
    stacked, loader = _stack_epoch(loader)
    if stacked is not None:
        return _epoch_scan_for(step)(state, stacked, key)

    from salun.dist import context as dist_ctx

    m = None
    for b in loader:
        key, sub = jax.random.split(key)
        state, m = step(state, dist_ctx.ingest(b), sub)
    return state, m, key


_EPOCH_SCANS_FOLDED = None


def _epoch_scan_folded_for(step):
    global _EPOCH_SCANS_FOLDED
    import weakref

    if _EPOCH_SCANS_FOLDED is None:
        _EPOCH_SCANS_FOLDED = weakref.WeakKeyDictionary()
    run = _EPOCH_SCANS_FOLDED.get(step)
    if run is None:

        @partial(jax.jit, donate_argnums=0)
        def run(state, stacked, key, offset):
            n = jax.tree.leaves(stacked)[0].shape[0]

            def body(st, x):
                batch, i = x
                sub = jax.random.fold_in(key, offset + i)
                st, m = step(st, batch, sub)
                return st, m

            state, ms = jax.lax.scan(
                body, state, (stacked, jnp.arange(n, dtype=jnp.int32)))
            return state, jax.tree.map(lambda x: x[-1], ms)

        try:
            _EPOCH_SCANS_FOLDED[step] = run
        except TypeError:
            pass
    return run


def run_epoch_folded(step, state, loader, key, step_offset: int):
    """Like :func:`run_epoch` but with the pretrain driver's
    resume-invariant key discipline: per-step key =
    ``fold_in(key, step_offset + i)`` (cli/main_train.py). Returns
    ``(state, last_metrics)``."""
    stacked, loader = _stack_epoch(loader)
    if stacked is not None:
        return _epoch_scan_folded_for(step)(
            state, stacked, key, jnp.int32(step_offset))

    from salun.dist import context as dist_ctx

    m = None
    for i, b in enumerate(loader):
        sub = jax.random.fold_in(key, step_offset + i)
        state, m = step(state, dist_ctx.ingest(b), sub)
    return state, m


def weighted_accuracy(logits, labels, weight=None):
    pred = jnp.argmax(logits, axis=-1)
    correct = (pred == labels).astype(jnp.float32)
    if weight is None:
        return correct.mean() * 100.0
    return jnp.sum(correct * weight) / jnp.maximum(jnp.sum(weight), 1.0) * 100.0


def make_eval_step(model):
    @jax.jit
    def step(params, batch_stats, batch):
        img = to_float(batch["image"])
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        out = model.apply(variables, img, train=False)
        pred = jnp.argmax(out, axis=-1)
        correct = (pred == batch["label"]).astype(jnp.float32) * batch["weight"]
        return jnp.sum(correct), jnp.sum(batch["weight"])

    return step


def validate(model, state: TrainState, loader) -> float:
    """Top-1 accuracy in %, parity with trainer/val.py."""
    from salun.dist import context as dist_ctx

    step = make_eval_step(model)
    correct = total = 0.0
    for batch in loader:
        batch = dist_ctx.ingest(batch)
        c, t = step(state.params, state.batch_stats, batch)
        correct += float(c)
        total += float(t)
    return 100.0 * correct / max(total, 1.0)


def train_epochs(
    model,
    state: TrainState,
    loader_factory,
    tx,
    epochs: int,
    key,
    *,
    step_fn=None,
    hooks=(),
):
    """Generic epoch loop: one scanned dispatch per epoch when possible
    (see :func:`run_epoch`), streaming otherwise."""
    step_fn = step_fn or make_train_step(model, tx)
    metrics = []
    for epoch in range(epochs):
        state, m, key = run_epoch(step_fn, state, loader_factory(epoch), key)
        metrics.append(jax.tree.map(float, m))
        for h in hooks:
            h(epoch, state, metrics[-1])
    return state, metrics


def train_with_rewind(*args, **kwargs):
    """Re-export (the reference declares but never defines this —
    trainer/__init__.py:1 vs trainer/train.py, a latent ImportError; the
    working implementation lives in salun.core.omp)."""
    from salun.core.omp import train_with_rewind as impl

    return impl(*args, **kwargs)
