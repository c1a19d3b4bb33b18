"""Shared TPU benchmarking utilities (the axon-tunnel-safe recipes).

Two hard-won rules for this container's remote-execution backend
(docs/BENCHMARKS.md "timing methodology"):

- python-loop dispatch timing reads ~0 ms, and ``jax.block_until_ready``
  on an array output can silently no-op — only a fetched SCALAR reliably
  forces execution;
- operands must be jit *parameters*: closure capture embeds them as HLO
  literals (176 MB literals hang the remote compile).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

CACHE_DIR = "/tmp/salun_jax_cache"


def enable_compile_cache(path: str = CACHE_DIR) -> None:
    """Persistent XLA compile cache: repeat runs skip the multi-minute
    remote compiles (cache hits load a 135 MB DDPM-step executable in
    ~20 s vs ~550 s to compile)."""
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass


def scan_time(fn, *args, iters: int = 30, feed=None) -> float:
    """Per-call device seconds for ``fn(*args)`` via in-graph repetition.

    Scans ``fn`` with its output fed back into the first argument (``feed``
    maps the op output to an args[0]-shaped array; default identity) and
    fetches a scalar reduction of the final carry — the only trustworthy
    per-op timing on the axon backend.
    """
    feed = feed or (lambda out: out)
    x0 = args[0]

    @jax.jit
    def run(x, *rest):
        def body(x, _):
            out = fn(x, *rest)
            return feed(out).astype(x0.dtype), ()

        x, _ = jax.lax.scan(body, x, None, length=iters)
        return jnp.sum(x.astype(jnp.float32))

    float(run(*args))  # compile + warm
    t0 = time.perf_counter()
    float(run(*args))
    return (time.perf_counter() - t0) / iters
