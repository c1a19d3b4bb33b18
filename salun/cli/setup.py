"""Model+dataset factory (parity: Classification/utils.py:112-285
setup_model_dataset) plus the forget/retain loader construction shared by
the unlearn drivers (main_random.py:50-110, generate_mask.py:108-187)."""

from __future__ import annotations


import numpy as np

from salun.data import datasets as D
from salun.data.loader import BatchIterator
from salun.data.splits import (
    drop_class, forget_retain_split, replace_class, replace_indexes,
    validation_split,
)
from salun.models import create_model


def setup_model_dataset(args):
    """Returns (model, train_full, val, test, marked) — the same 5-tuple
    shape as the reference factory (utils.py:112-285)."""
    name = args.dataset
    # no-val variants: full train set, val == test
    # (utils.py:257-275, dataset.py:21-70 / 297-345)
    no_val = name.endswith("_no_val")
    if no_val:
        name = name[: -len("_no_val")]
    if name in ("cifar10", "svhn", "synthetic"):
        num_classes = 10
    elif name == "cifar100":
        num_classes = 100
    elif name in ("TinyImagenet", "tiny_imagenet"):
        num_classes = 200
    elif name == "imagenet":
        num_classes = 1000
    else:
        raise KeyError(name)
    args.num_classes = num_classes

    train = D.load(name, args.data, train=True)
    test = D.load(name, args.data, train=False)

    if name in ("cifar10", "cifar100", "svhn") and not no_val:
        # deterministic 10%-per-class val split (dataset.py:576-593; SVHN
        # uses the same scheme, dataset.py:107-123)
        train, val = validation_split(train, seed=args.seed)
    else:
        val = test

    marked = train.copy()
    if args.class_to_replace is not None and getattr(args, "indexes_to_replace", None):
        raise ValueError("only one of class/indexes_to_replace")
    if getattr(args, "indexes_to_replace", None):
        marked = replace_indexes(marked, np.asarray(args.indexes_to_replace),
                                 seed=args.seed - 1, only_mark=True)
    elif args.class_to_replace is not None:
        marked = replace_class(
            marked, args.class_to_replace,
            num_indexes_to_replace=args.num_indexes_to_replace,
            seed=args.seed - 1, only_mark=True,
        )
        # full-class removal filters the test set (dataset.py:606-609)
        if args.class_to_replace >= 0 and (
            args.num_indexes_to_replace is None
            or args.num_indexes_to_replace == 4500
        ):
            test = drop_class(test, args.class_to_replace)

    model = create_model(args.arch, num_classes,
                         imagenet=getattr(args, "imagenet_arch", False))
    return model, train, val, test, marked


def build_unlearn_loaders(args, train, val, test, marked):
    """forget/retain/val/test loader dict (main_random.py:50-110)."""
    forget, retain = forget_retain_split(marked)
    assert len(forget) + len(retain) == len(train)
    return {
        "forget": BatchIterator(forget, args.batch_size, shuffle=True,
                                seed=args.seed),
        "retain": BatchIterator(retain, args.batch_size, shuffle=True,
                                seed=args.seed),
        "val": BatchIterator(val, args.batch_size, shuffle=False),
        "test": BatchIterator(test, args.batch_size, shuffle=False),
    }, forget, retain
