"""Unified checkpoint store (orbax).

Replaces the reference's three ad-hoc schemes (SURVEY.md §5.4):
- Classification ``{"state_dict", "evaluation_result"}`` .pth.tar
  (Classification/utils.py:44-61, unlearn/impl.py:21-51)
- DDPM ``[model, optimizer, step, (ema)]`` list pickles
  (DDPM/runners/diffusion.py:252-265)
- SD CompVis/diffusers twin dumps (SD/train-scripts/random_label.py:175-199)

One orbax-based store holding {params, batch_stats, opt_state, step, ema,
eval_results, masks} with async-friendly saves (preemption tolerance on
TPU). Plus numpy ``.npz`` fallbacks for environments without orbax write
access.
"""

from __future__ import annotations

import json
import os

import jax
import numpy as np
from flax import traverse_util


def _to_numpy_tree(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save(path: str, payload: dict) -> None:
    """Save a checkpoint dict of pytrees (orbax if available, else npz)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(os.path.abspath(path), _to_numpy_tree(payload), force=True)
    except Exception:
        flat = traverse_util.flatten_dict(_to_numpy_tree(payload), sep="/")
        np.savez(path + ".npz", **{k: v for k, v in flat.items()})


def restore(path: str) -> dict:
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        return ckptr.restore(os.path.abspath(path))
    except Exception:
        data = np.load(path + ".npz", allow_pickle=True)
        flat = {k: data[k] for k in data.files}
        return traverse_util.unflatten_dict(flat, sep="/")


def save_eval_results(save_dir: str, name: str, results: dict) -> None:
    """Eval dumps as JSON (reference stores them inside checkpoints,
    unlearn/impl.py:21-30; JSON keeps them greppable)."""
    os.makedirs(save_dir, exist_ok=True)
    with open(os.path.join(save_dir, f"{name}_eval_result.json"), "w") as f:
        json.dump(jax.tree.map(float, results), f, indent=2)
