"""Unified checkpoint store (orbax).

Replaces the reference's three ad-hoc schemes (SURVEY.md §5.4):
- Classification ``{"state_dict", "evaluation_result"}`` .pth.tar
  (Classification/utils.py:44-61, unlearn/impl.py:21-51)
- DDPM ``[model, optimizer, step, (ema)]`` list pickles
  (DDPM/runners/diffusion.py:252-265)
- SD CompVis/diffusers twin dumps (SD/train-scripts/random_label.py:175-199)

One orbax-based store holding {params, batch_stats, opt_state, step, ema,
eval_results, masks} with async-friendly saves (preemption tolerance on
TPU). A numpy ``.npz`` fallback exists only for environments without orbax
installed; the on-disk artifact itself records the format (orbax saves a
directory at ``path``, the fallback a ``path + ".npz"`` file) and restore
dispatches on what exists — the two can never silently diverge.

Arbitrary pytrees (flax structs, optax states, namedtuples) are serialized
through ``flax.serialization.to_state_dict`` and restored into a matching
template with :func:`restore_like`.
"""

from __future__ import annotations

import json
import os

import jax
import numpy as np
from flax import serialization, traverse_util


def _to_numpy_tree(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def _npz_path(path: str) -> str:
    return path + ".npz"


def save(path: str, payload: dict) -> None:
    """Save a checkpoint pytree (orbax if installed, else npz fallback)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    state = _to_numpy_tree(serialization.to_state_dict(payload))
    try:
        import orbax.checkpoint as ocp
    except ImportError:
        flat = traverse_util.flatten_dict(state, sep="/")
        # write through a file object: np.savez(str) only appends ".npz"
        # when absent, which would diverge from _npz_path on a path that
        # already ends in ".npz"
        with open(_npz_path(path), "wb") as f:
            np.savez(f, **{k: v for k, v in flat.items()})
        return
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(os.path.abspath(path), state, force=True)


def exists(path: str) -> bool:
    return os.path.isdir(path) or os.path.exists(_npz_path(path))


def restore(path: str) -> dict:
    """Restore the raw checkpoint dict; format chosen by what is on disk."""
    if os.path.isdir(path):
        try:
            import orbax.checkpoint as ocp
        except ImportError as e:
            raise RuntimeError(
                f"checkpoint {path!r} was written by orbax but orbax is not "
                "installed in this environment"
            ) from e
        ckptr = ocp.PyTreeCheckpointer()
        return ckptr.restore(os.path.abspath(path))
    if os.path.exists(_npz_path(path)):
        data = np.load(_npz_path(path), allow_pickle=True)
        flat = {k: data[k] for k in data.files}
        return traverse_util.unflatten_dict(flat, sep="/")
    raise FileNotFoundError(
        f"no checkpoint at {path!r} (neither orbax dir nor {_npz_path(path)})"
    )


def save_sharded(path: str, payload, *, async_: bool = False):
    """Save a pytree of ``jax.Array``s WITH their shardings — no host
    gather (``save`` converts to host numpy first, which replicates a
    sharded FSDP/TP state onto one host; this path writes each shard from
    the device that owns it — the production TPU-pod checkpoint shape).

    With ``async_=True`` the write happens in a background thread
    (orbax ``AsyncCheckpointer``) so the training loop keeps stepping —
    preemption-tolerant checkpointing; call ``.wait_until_finished()``
    on the returned checkpointer before relying on the artifact (or
    before process exit). Returns the checkpointer either way.
    """
    import orbax.checkpoint as ocp

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    state = serialization.to_state_dict(payload)
    ckptr = _sharded_checkpointer(async_)
    ckptr.save(os.path.abspath(path), args=ocp.args.StandardSave(state),
               force=True)
    return ckptr


_SHARDED_CKPTRS = {}


def _sharded_checkpointer(async_: bool):
    """One cached (Async)Checkpointer per process — constructing one per
    save would leak its background threads/barrier machinery over a long
    checkpoint loop. AsyncCheckpointer.save itself waits for the previous
    in-flight save, so reuse is the supported pattern."""
    import orbax.checkpoint as ocp

    ckptr = _SHARDED_CKPTRS.get(async_)
    if ckptr is None:
        ckptr = (ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
                 if async_
                 else ocp.Checkpointer(ocp.StandardCheckpointHandler()))
        _SHARDED_CKPTRS[async_] = ckptr
    return ckptr


def restore_sharded(path: str, like):
    """Restore a :func:`save_sharded` checkpoint into the structure,
    dtypes, AND shardings of ``like`` (a pytree of ``jax.Array``s or
    ``jax.ShapeDtypeStruct``s carrying shardings). Each device reads only
    its own shards, so this restores across topologies — save on an
    8-way mesh, restore on 4×2 (tests/test_ckpt_sharded.py)."""
    import orbax.checkpoint as ocp

    abstract = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(
            x.shape, x.dtype,
            sharding=getattr(x, "sharding", None)),
        serialization.to_state_dict(like))
    ckptr = _sharded_checkpointer(async_=False)
    raw = ckptr.restore(os.path.abspath(path),
                        args=ocp.args.StandardRestore(abstract))
    return serialization.from_state_dict(like, raw)


def restore_like(path: str, template):
    """Restore into the structure of ``template`` (flax structs, optax
    states, namedtuples all supported — parity with the reference's resume
    of model+optimizer+scheduler state, main_train.py:85-98)."""
    return from_state_dict(template, restore(path))


def from_state_dict(template, raw):
    return serialization.from_state_dict(template, raw)


def save_eval_results(save_dir: str, name: str, results: dict) -> None:
    """Eval dumps as JSON (reference stores them inside checkpoints,
    unlearn/impl.py:21-30; JSON keeps them greppable)."""
    os.makedirs(save_dir, exist_ok=True)
    with open(os.path.join(save_dir, f"{name}_eval_result.json"), "w") as f:
        json.dump(jax.tree.map(float, results), f, indent=2)
