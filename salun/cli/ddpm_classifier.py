"""DDPM classifier evaluation + classifier training.

Parity:
- train_classifier (DDPM/train_classifier.py): fine-tune a ResNet-34 @224
  on CIFAR-10 for the forgotten-class probe.
- classifier_evaluation (DDPM/classifier_evaluation.py:16-147): run the
  classifier over generated samples of the forgotten class and report
  average entropy, average forgotten-class probability, and accuracy
  (the DDPM/README.md:95-99 metrics).

Usage:
  python -m salun.cli.ddpm_classifier train --data ./data --save_dir ...
  python -m salun.cli.ddpm_classifier eval --sample_path samples/0 \
      --label_of_forgotten_class 0 --ckpt ...
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from salun import ckpt
from salun.core.train import TrainState, make_train_step
from salun.data import datasets as D
from salun.data.loader import BatchIterator
from salun.models import create_model
from salun.utils.rng import seed_all

IMG_SIZE = 224  # classifier_evaluation.py evaluates at 224


def _resize_batch(x):
    b = x.shape[0]
    return jax.image.resize(x, (b, IMG_SIZE, IMG_SIZE, x.shape[-1]),
                            "bilinear")


def _fc_labels(params):
    """'fc' / 'body' label tree for the reference's two-group optimizer
    (train_classifier.py:141-148: body at lr, the re-initialized fc head
    at lr×10)."""
    return {k: jax.tree.map(lambda _: "fc" if k == "fc" else "body", v)
            for k, v in params.items()}


def train(args):
    import optax

    seed_all(args.seed)
    key = jax.random.PRNGKey(args.seed)
    ds = D.load(args.dataset, args.data, train=True)
    if args.limit < 0:
        raise SystemExit("--limit must be >= 0")
    if args.limit:
        ds = ds.select(range(min(args.limit, len(ds))))
    model = create_model("resnet34", num_classes=ds.num_classes)

    loader = BatchIterator(ds, args.batch_size, shuffle=True, seed=args.seed)
    variables = model.init(key, jnp.zeros((1, IMG_SIZE, IMG_SIZE, 3)),
                           train=False)
    if args.init_weights:
        # torchvision ImageNet-pretrained resnet34 init, fc re-initialized
        # (train_classifier.py:124-135: pretrained=True, new Linear(512,10))
        from salun.ckpt import import_resnet

        p1k, s1k = import_resnet(args.init_weights, num_classes=1000)
        p1k.pop("fc", None)  # keep the fresh 10-class head from init
        variables = {
            "params": {**variables["params"], **p1k},
            "batch_stats": s1k or variables.get("batch_stats", {}),
        }
    # reference optimizer (train_classifier.py:138-148): torch Adam with
    # L2-in-gradient weight decay 5e-4, body at lr, fc head at lr×10;
    # --freeze_layers trains the head only
    def group(lr):
        return optax.chain(optax.add_decayed_weights(5e-4),
                           optax.adam(lr))

    tx = optax.multi_transform(
        {"body": (optax.set_to_zero() if args.freeze_layers
                  else group(args.lr)),
         "fc": group(args.lr * 10)},
        _fc_labels(variables["params"]))
    state = TrainState.create(variables, tx)

    base_step = make_train_step(model, tx, use_augment=True,
                                num_classes=ds.num_classes)

    for epoch in range(args.epochs):
        for batch in loader:
            key, sub = jax.random.split(key)
            batch = jax.tree.map(jnp.asarray, batch)
            batch = dict(batch, image=_resize_batch(
                batch["image"].astype(jnp.float32) / 255.0) * 255.0)
            state, m = base_step(state, batch, sub)
        print(f"epoch {epoch} train acc {float(m['acc']):.2f}")
    ckpt.save(os.path.join(args.save_dir, "classifier"), {
        "params": state.params, "batch_stats": state.batch_stats,
    })


def evaluate(args):
    from salun.cli.ddpm_evaluator import read_images_folder

    model = create_model("resnet34", num_classes=10)
    if args.ckpt.endswith((".pt", ".pth", ".pth.tar")):
        # the reference's own trained classifier ("{dataset}_resnet34.pth",
        # classifier_evaluation.py:135-140) — torch-format import
        from salun.ckpt import import_resnet

        params, stats = import_resnet(args.ckpt, num_classes=10)
    else:
        payload = ckpt.restore(args.ckpt)
        params, stats = payload["params"], payload["batch_stats"]

    imgs = read_images_folder(args.sample_path)

    # weights as jit args, not closures (HLO-literal embedding; tpu_bench)
    @jax.jit
    def probs_of(p, s, x):
        x = _resize_batch(x)
        out = model.apply({"params": p, "batch_stats": s}, x, train=False)
        return jax.nn.softmax(out.astype(jnp.float32), axis=-1)

    probs = []
    for i in range(0, len(imgs), args.batch_size):
        probs.append(np.asarray(probs_of(
            params, stats, jnp.asarray(imgs[i:i + args.batch_size]))))
    probs = np.concatenate(probs)

    entropy = -(probs * np.log(np.maximum(probs, 1e-12))).sum(1)
    c = args.label_of_forgotten_class
    results = {
        "avg_entropy": float(entropy.mean()),
        "avg_prob_of_forgotten_class": float(probs[:, c].mean()),
        "accuracy_on_forgotten_class": float(
            (probs.argmax(1) == c).mean()
        ),
    }
    print(results)
    os.makedirs(args.save_dir, exist_ok=True)
    with open(os.path.join(args.save_dir, "classifier_eval.json"), "w") as f:
        json.dump(results, f, indent=2)
    return results


def main(argv=None):
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)
    tr = sub.add_parser("train")
    tr.add_argument("--dataset", default="cifar10")
    tr.add_argument("--data", default="./data")
    tr.add_argument("--batch_size", type=int, default=64)
    tr.add_argument("--epochs", type=int, default=10)
    tr.add_argument("--lr", type=float, default=0.01)
    tr.add_argument("--seed", type=int, default=1)
    tr.add_argument("--save_dir", default="results/classifier")
    tr.add_argument("--limit", type=int, default=0,
                    help="cap train set size (smoke runs); 0 = full")
    tr.add_argument("--init_weights", default=None,
                    help="torchvision ImageNet resnet34 .pth to fine-tune "
                         "from (train_classifier.py pretrained=True); "
                         "default random init")
    tr.add_argument("--freeze_layers", action="store_true",
                    help="train only the fc head (train_classifier.py "
                         "--freeze_layers)")
    ev = sub.add_parser("eval")
    ev.add_argument("--sample_path", required=True)
    ev.add_argument("--label_of_forgotten_class", type=int, default=0)
    ev.add_argument("--ckpt", required=True)
    ev.add_argument("--batch_size", type=int, default=64)
    ev.add_argument("--save_dir", default="results/classifier")
    args = p.parse_args(argv)
    if args.cmd == "train":
        train(args)
    else:
        evaluate(args)


if __name__ == "__main__":
    main()
