"""Pretraining driver (parity: Classification/main_train.py:30-159).

SGD momentum + MultiStepLR (milestones 91,136 γ=0.1) or cosine-warmup for
ImageNet archs; per-epoch validation; best-SA checkpoint; loss/accuracy
curves dumped as JSON (and PNG when matplotlib is present).

Usage: python -m salun.cli.main_train --dataset cifar10 --arch resnet18 ...
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from salun import ckpt
from salun.cli.args import parse_args
from salun.cli.setup import setup_model_dataset
from salun.core import masked_opt
from salun.core.train import (
    TrainState, cosine_warmup_lr, make_train_step, multistep_lr, validate,
)
from salun.data.loader import BatchIterator
from salun.utils.rng import seed_all


def main(argv=None):
    args = parse_args(argv)
    from salun.dist import context as dist_ctx

    # --dp N: data-parallel pretraining (batches shard, state replicates,
    # GSPMD all-reduces grads over ICI) — see salun/dist/context.py
    mesh = dist_ctx.mesh_from_flags(args.dp)
    with dist_ctx.activate(mesh):
        return _main(args, mesh)


def _main(args, mesh):
    from salun.dist import context as dist_ctx

    os.makedirs(args.save_dir, exist_ok=True)
    key = seed_all(args.seed)

    model, train, val, test, _ = setup_model_dataset(args)
    loader = BatchIterator(train, args.batch_size, shuffle=True,
                           seed=args.train_seed)
    steps_per_epoch = len(loader)

    milestones = [int(x) for x in args.decreasing_lr.split(",") if x]
    if args.imagenet_arch:
        sched = cosine_warmup_lr(args.lr, args.warmup, args.epochs,
                                 steps_per_epoch)
    else:
        sched = multistep_lr(args.lr, milestones, steps_per_epoch)
    tx = masked_opt.sgd(sched, args.momentum, args.weight_decay)

    size = 224 if args.imagenet_arch else 32
    variables = model.init(key, jnp.zeros((1, size, size, 3)), train=False)
    if mesh is not None:
        variables = dist_ctx.place_replicated(variables, mesh)
    state = TrainState.create(variables, tx)
    step = make_train_step(model, tx, use_augment=not args.no_aug,
                           num_classes=args.num_classes)

    best_sa = 0.0
    start_epoch = 0
    curves = {"train_acc": [], "val_acc": [], "test_acc": []}
    ckpt_path = os.path.join(args.save_dir, "checkpoint")
    if args.resume and ckpt.exists(ckpt_path):
        # Parity: reference resumes model+optimizer+scheduler+epoch+best_sa
        # +curves (main_train.py:85-98). The LR schedule is a pure function
        # of state.step here, so restoring the state restores the schedule.
        raw = ckpt.restore(ckpt_path)
        state = ckpt.from_state_dict(state, raw["state"])
        if mesh is not None:
            state = dist_ctx.place_replicated(state, mesh)
        start_epoch = int(np.asarray(raw["epoch"]))
        best_sa = float(np.asarray(raw["best_sa"]))
        curves = {k: [float(x) for x in np.asarray(v)]
                  for k, v in raw["curves"].items()}
        print(f"resume from {ckpt_path} at epoch {start_epoch} "
              f"(best_sa={best_sa:.2f})")
    from salun.core.train import run_epoch_folded

    for epoch in range(start_epoch, args.epochs):
        t0 = time.time()
        loader.set_epoch(epoch)
        # per-step key = f(seed, global step): resume-invariant; the whole
        # epoch dispatches as one lax.scan when the dataset is in-memory
        state, m = run_epoch_folded(step, state, loader, key,
                                    epoch * steps_per_epoch)
        train_acc = float(m["acc"])
        val_acc = validate(model, state,
                           BatchIterator(val, args.batch_size, shuffle=False))
        test_acc = validate(model, state,
                            BatchIterator(test, args.batch_size, shuffle=False))
        curves["train_acc"].append(train_acc)
        curves["val_acc"].append(val_acc)
        curves["test_acc"].append(test_acc)
        print(f"epoch {epoch} train {train_acc:.2f} val {val_acc:.2f} "
              f"test {test_acc:.2f} ({time.time() - t0:.1f}s)")

        is_best = val_acc > best_sa
        best_sa = max(val_acc, best_sa)
        ckpt.save(ckpt_path, {
            "state": state, "epoch": epoch + 1, "best_sa": best_sa,
            "curves": {k: np.asarray(v, np.float32)
                       for k, v in curves.items()},
        })
        if is_best:
            ckpt.save(os.path.join(args.save_dir, "model_SA_best"), {
                "params": state.params, "batch_stats": state.batch_stats,
            })

    with open(os.path.join(args.save_dir, "train_curves.json"), "w") as f:
        json.dump(curves, f)
    _maybe_plot(curves, args.save_dir)


def _maybe_plot(curves, save_dir):
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        for name, ys in curves.items():
            plt.plot(ys, label=name)
        plt.legend()
        plt.savefig(os.path.join(save_dir, "net_train.png"))
        plt.close()
    except Exception:
        pass


if __name__ == "__main__":
    main()
