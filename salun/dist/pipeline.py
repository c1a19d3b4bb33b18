"""Pipeline parallelism (GPipe-style microbatching) over a mesh axis.

The reference's largest model (the SD v1 U-Net, 859.5M params) fits on
one chip, so the reference never pipelines — its only multi-GPU trick is
manual 2-device placement (SURVEY.md §2.5). This module supplies the
missing scale axis for models that will NOT fit even under FSDP: split a
homogeneous stack of stages over a ``pipe`` mesh axis and stream
microbatches through the ring, so each device holds only 1/S of the
parameters and activations flow over ICI.

Algorithm (GPipe, Huang et al., arXiv:1811.06965, in the standard
JAX/shard_map formulation of the scaling book): with ``S`` stages and
``M`` microbatches, run ``M + S - 1`` ticks. Each tick every device (a)
injects the next microbatch if it is stage 0, (b) applies its stage to
the activation it currently holds, (c) records the result if it is the
last stage, and (d) passes the activation to its ``ppermute`` ring
neighbor. Microbatch ``m`` is computed by stage ``s`` at tick ``m + s``,
so the pipeline drains after ``M + S - 1`` ticks with bubble fraction
``(S-1)/(M+S-1)``. The tick loop is a ``lax.scan`` (one compiled
program; no per-tick dispatch) and every step is differentiable —
``ppermute`` has a transpose rule, so ``jax.grad`` through
:func:`pipeline_apply` emits the reverse pipeline automatically.

Composes with data parallelism on a 2-D (data, pipe) mesh: pass
``batch_axis="data"`` and the microbatch dimension is itself sharded
over the data axis while stages shard over the pipe axis
(``__graft_entry__._dryrun_pp`` runs the full dp×pp training step).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def stack_stage_params(stages: Sequence) -> object:
    """Stack per-stage param pytrees along a new leading ``stage`` axis.

    All stages must share one tree structure and leaf shapes (homogeneous
    stack — the GPT-block / residual-tower case pipelining is for).
    """
    return jax.tree.map(lambda *leaves: jnp.stack(leaves), *stages)


def stage_sharding(mesh: Mesh, axis: str = "model") -> NamedSharding:
    """Sharding that splits the stacked ``stage`` axis over ``axis``."""
    return NamedSharding(mesh, P(axis))


def _vary(x, axis_names):
    # scan carries must enter with the same varying-manual-axes type they
    # exit with (same trick as ring_attention._ring_body); the carry ends
    # up varying over the pipe axis (params) AND the batch axis (data).
    # Cast only the axes x is not already varying over — pcast rejects a
    # mixed invarying/varying axis tuple (e.g. zeros_like of a
    # data-sharded input is already data-varying).
    try:
        have = jax.typeof(x).vma
    except Exception:
        have = frozenset()
    need = tuple(a for a in axis_names if a not in have)
    if not need:
        return x
    if hasattr(jax.lax, "pcast"):
        return jax.lax.pcast(x, need, to="varying")
    return jax.lax.pvary(x, need)


def _pipe_body(stage_params, x, *, stage_fn, axis: str, n_stages: int,
               n_micro: int, remat: bool, vary_axes):
    """Per-device program: local stage params [1, ...], microbatched input
    x [M, mb, ...] (mb possibly data-sharded outside this spec) →
    [1, M, mb, ...] outputs, meaningful on the last stage."""
    params = jax.tree.map(lambda p: p[0], stage_params)
    s = jax.lax.axis_index(axis)
    state = _vary(jnp.zeros(x.shape[1:], x.dtype), vary_axes)
    out = _vary(jnp.zeros_like(x), vary_axes)
    perm = [(j, (j + 1) % n_stages) for j in range(n_stages)]
    fn = jax.checkpoint(stage_fn) if remat else stage_fn

    def tick(carry, t):
        state, out = carry
        # (a) stage 0 ingests microbatch t (clamped reads past M are
        # never collected: they would exit at tick t+S-1 > M+S-2)
        mb = jax.lax.dynamic_index_in_dim(
            x, jnp.minimum(t, n_micro - 1), 0, keepdims=False)
        state = jnp.where(s == 0, mb, state)
        # (b) this device's stage
        y = fn(params, state)
        # (c) last stage records microbatch t-(S-1). Select at the SLICE
        # level, then always dynamic_update: a full-buffer jnp.where
        # would force XLA to copy `out` every tick (the traced predicate
        # defeats in-place aliasing of the scan carry).
        oidx = jnp.clip(t - (n_stages - 1), 0, n_micro - 1)
        cur = jax.lax.dynamic_index_in_dim(out, oidx, 0, keepdims=False)
        rec = jnp.where((s == n_stages - 1) & (t >= n_stages - 1), y, cur)
        out = jax.lax.dynamic_update_index_in_dim(out, rec, oidx, 0)
        # (d) activation moves one stage down the ring
        state = jax.lax.ppermute(y, axis, perm)
        return (state, out), None

    (_, out), _ = jax.lax.scan(
        tick, (state, out), jnp.arange(n_micro + n_stages - 1))
    return out[None]


def pipeline_apply(
    stage_fn: Callable,
    stage_params,
    x: jnp.ndarray,
    mesh: Mesh,
    *,
    axis: str = "model",
    num_microbatches: Optional[int] = None,
    batch_axis: Optional[str] = None,
    remat: bool = True,
) -> jnp.ndarray:
    """Apply ``S`` stacked stages to ``x`` [B, ...], pipelined over ``axis``.

    ``stage_fn(params, h) -> h`` is one stage (shape-preserving);
    ``stage_params`` leaves carry a leading stage dim of size
    ``mesh.shape[axis]`` (see :func:`stack_stage_params`), sharded over
    ``axis``. ``num_microbatches`` (default: the pipe size, a balanced
    2× bubble) must divide B. With ``batch_axis`` set, each microbatch is
    additionally sharded over that mesh axis (dp×pp). ``remat=True``
    recomputes stage activations in the backward — the scan would
    otherwise save every tick's activations as residuals, defeating the
    memory point of pipelining.

    Exactness: equals applying the stages sequentially on one device
    (tests/test_pipeline.py asserts fwd and grads on the 8-way CPU mesh).
    """
    n_stages = mesh.shape[axis]
    first = jax.tree.leaves(stage_params)[0]
    if first.shape[0] != n_stages:
        raise ValueError(
            f"stage_params leading dim {first.shape[0]} != {axis} axis "
            f"size {n_stages}")
    m = num_microbatches if num_microbatches is not None else n_stages
    if x.shape[0] % m:
        raise ValueError(f"batch {x.shape[0]} not divisible by "
                         f"num_microbatches {m}")
    xm = x.reshape((m, x.shape[0] // m) + x.shape[1:])

    pspec = P(axis)
    xspec = P(None, batch_axis)
    vary_axes = (axis,) if batch_axis is None else (axis, batch_axis)
    fn = shard_map(
        partial(_pipe_body, stage_fn=stage_fn, axis=axis,
                n_stages=n_stages, n_micro=m, remat=remat,
                vary_axes=vary_axes),
        mesh=mesh,
        in_specs=(jax.tree.map(lambda _: pspec, stage_params), xspec),
        out_specs=P(axis, None, batch_axis),
    )
    out = fn(stage_params, xm)
    # per-stage leading dim: only the last stage's copy is the answer
    return out[-1].reshape(x.shape[0:1] + out.shape[3:])
