"""Saliency-mask generation driver
(parity: Classification/generate_mask.py:85-202).

Loads the pretrained model, iterates the forget loader accumulating grads
of −CE, thresholds at 0.1…1.0, and saves ``with_{t}`` masks (orbax/npz +
torch-compatible name dict via salun.ckpt.export_mask).

Usage: python -m salun.cli.generate_mask --dataset cifar10 --model_path ...
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from salun import ckpt
from salun.cli.args import parse_args
from salun.cli.setup import build_unlearn_loaders, setup_model_dataset
from salun.core import (accumulate_saliency, accumulate_saliency_scanned,
                        generate_masks)
from salun.core.mask import DEFAULT_THRESHOLDS
from salun.core.train import cross_entropy
from salun.data.loader import augment, to_float
from salun.utils.rng import seed_all


def save_gradient_ratio(loaders, model, params, batch_stats, args):
    forget_loader = loaders["forget"]
    # Parity: the reference's forget loader inherits the marked TRAIN
    # dataset's transform — RandomCrop(pad 4) + RandomHorizontalFlip
    # (dataset.py:24-31) — so saliency is accumulated over augmented
    # images (model.eval(), generate_mask.py:30-44). ImageNet archs use a
    # different transform stack and stream separately; skip there.
    use_augment = not getattr(args, "no_aug", False) \
        and not getattr(args, "imagenet_arch", False)

    def grad_fn(params, batch):
        def loss(p):
            variables = {"params": p}
            if batch_stats:
                variables["batch_stats"] = batch_stats
            img = to_float(batch["image"])
            if "aug_key" in batch:
                img = augment(batch["aug_key"], img)
            out = model.apply(variables, img, train=False)
            # loss = −CE (generate_mask.py:36)
            return -cross_entropy(out, batch["label"], batch.get("weight"))

        return jax.grad(loss)(params)

    batches = [b for b in forget_loader]
    if use_augment:
        keys = jax.random.split(jax.random.PRNGKey(args.seed + 1),
                                len(batches))
        for b, k in zip(batches, keys):
            b["aug_key"] = k
    from salun.dist import context as dist_ctx

    same_shape = len({b["image"].shape for b in batches}) == 1
    if same_shape and len(batches) > 1:
        # fast path: the whole forget epoch as ONE dispatched lax.scan
        # (the reference recipes' forget sets are a few thousand images -
        # stacking on device is cheap, and per-batch dispatch latency
        # dominates the streamed variant on a remote backend). dim 0 is
        # the step axis; the batch axis shards over an active --dp mesh.
        import numpy as np

        stacked = dist_ctx.ingest(
            jax.tree.map(lambda *xs: np.stack([np.asarray(x) for x in xs]),
                         *batches), dim=1)
        sal = accumulate_saliency_scanned(grad_fn, params, stacked)
    else:
        sal = accumulate_saliency(
            grad_fn, params, (dist_ctx.ingest(b) for b in batches),
        )
    masks = generate_masks(sal, DEFAULT_THRESHOLDS)
    for t, m in masks.items():
        ckpt.save(os.path.join(args.save_dir, f"with_{t}"), {"mask": m})
    return masks


def main(argv=None):
    args = parse_args(argv)
    from salun.dist import context as dist_ctx

    # --dp N: the saliency accumulation shards batches over the mesh; the
    # per-batch grads are psum'd by GSPMD and the exact global top-k runs
    # on the replicated accumulator (salun/dist/context.py)
    mesh = dist_ctx.mesh_from_flags(args.dp)
    with dist_ctx.activate(mesh):
        return _main(args, mesh)


def _main(args, mesh):
    from salun.dist import context as dist_ctx

    os.makedirs(args.save_dir, exist_ok=True)
    seed_all(args.seed)

    model, train, val, test, marked = setup_model_dataset(args)
    loaders, forget, retain = build_unlearn_loaders(args, train, val, test,
                                                    marked)
    print(f"number of retain dataset {len(retain)}")
    print(f"number of forget dataset {len(forget)}")

    key = jax.random.PRNGKey(args.seed)
    size = 224 if args.imagenet_arch else 32
    variables = model.init(key, jnp.zeros((1, size, size, 3)), train=False)
    params, batch_stats = variables["params"], variables.get("batch_stats", {})
    if args.model_path:
        params, batch_stats = _load_model(args.model_path, params, batch_stats)
    if mesh is not None:
        params = dist_ctx.place_replicated(params, mesh)
        batch_stats = dist_ctx.place_replicated(batch_stats, mesh)

    save_gradient_ratio(loaders, model, params, batch_stats, args)


def _load_model(path, params, batch_stats):
    if path.endswith(".pt") or path.endswith(".pth") or path.endswith(".pth.tar"):
        from salun.ckpt import import_resnet

        return import_resnet(path)
    payload = ckpt.restore(path)
    if "state" in payload and "params" not in payload:
        payload = payload["state"]  # pretrain "checkpoint" artifact
    return payload["params"], payload.get("batch_stats", batch_stats)


if __name__ == "__main__":
    main()
