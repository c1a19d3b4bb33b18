"""Profile the classification RL/retain train step on the real chip.

The north-star chain spends ~99% of its wall-clock in 1,750 of these
steps (bench.py::bench_salun_chain). This script answers "where do the
~13.5 ms go" with the r2 methodology: an AOT-compiled step timed by
scalar-fetch slope, plus a `jax.profiler.trace` whose device-op
durations are aggregated by op category.

Usage: timeout 900 python scripts/profile_cls_step.py [--trace]
"""

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from salun.utils.tpu_bench import enable_compile_cache

enable_compile_cache()


def build(bs=256, augment=True, random_labels=True, dtype=jnp.bfloat16,
          masked=True):
    from salun.core import masked_opt, threshold_mask
    from salun.core.train import TrainState, make_train_step
    from salun.models import create_model

    model = create_model("resnet18", num_classes=10, dtype=dtype)
    variables = jax.jit(lambda k: model.init(
        k, jnp.zeros((bs, 32, 32, 3)), train=False))(jax.random.PRNGKey(0))

    if masked:
        @jax.jit
        def _mk(params):
            sal = jax.tree.map(
                lambda p: jnp.abs(jax.random.normal(
                    jax.random.PRNGKey(1), p.shape)), params)
            return threshold_mask(sal, 0.5), jax.tree.map(jnp.copy, params)

        mask, theta0 = _mk(variables["params"])
        tx = masked_opt.masked_sgd_fused(0.013, 0.9, 5e-4, mask, theta0)
    else:
        import optax
        tx = optax.sgd(0.013, momentum=0.9)
    state = TrainState.create(variables, tx)
    step = make_train_step(model, tx, use_augment=augment,
                           random_labels=random_labels, num_classes=10)
    rng = np.random.RandomState(0)
    batch = {
        "image": jnp.asarray(rng.randint(0, 255, (bs, 32, 32, 3), np.uint8)),
        "label": jnp.asarray(rng.randint(0, 10, (bs,), np.int32)),
        "weight": jnp.ones((bs,), jnp.float32),
    }
    return step, state, batch


def timed_scan(step, state, batch, iters=100):
    """One scan of `iters` steps, scalar-fetched; returns s/step by the
    hi/lo slope to cancel fetch latency."""

    def make(n):
        @jax.jit
        def run(state, batch, key):
            keys = jax.random.split(key, n)

            def body(st, k):
                st, m = step(st, batch, k)
                return st, m["loss"]

            state, losses = jax.lax.scan(body, state, keys)
            return losses[-1]

        return run

    hi, lo = iters, iters // 5
    rhi, rlo = make(hi), make(lo)
    key = jax.random.PRNGKey(0)
    float(rhi(state, batch, key))
    float(rlo(state, batch, key))
    ths, tls = [], []
    for i in range(3):
        t0 = time.perf_counter()
        float(rhi(state, batch, jax.random.PRNGKey(i)))
        ths.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(rlo(state, batch, jax.random.PRNGKey(i)))
        tls.append(time.perf_counter() - t0)
    return (min(ths) - min(tls)) / (hi - lo)


def flops_of(step, state, batch):
    lowered = jax.jit(step).lower(state, batch, jax.random.PRNGKey(0))
    c = lowered.compile()
    a = c.cost_analysis()
    if isinstance(a, (list, tuple)):
        a = a[0]
    return float(a.get("flops", 0.0))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", action="store_true")
    ap.add_argument("--bs", type=int, default=256)
    args = ap.parse_args()

    peak = 197e12
    variants = [
        ("full (augment+rl+mask)", dict()),
        ("no-augment", dict(augment=False)),
        ("no-mask (plain sgd)", dict(masked=False)),
        ("fp32", dict(dtype=jnp.float32)),
    ]
    results = {}
    for name, kw in variants:
        step, state, batch = build(bs=args.bs, **kw)
        s = timed_scan(step, state, batch)
        f = flops_of(step, state, batch)
        results[name] = (s, f)
        print(json.dumps({
            "variant": name, "ms_per_step": round(s * 1e3, 3),
            "flops": f, "mfu": round(f / s / peak, 4),
            "img_per_s": round(args.bs / s, 1)}), flush=True)

    if args.trace:
        step, state, batch = build(bs=args.bs)
        tdir = "/tmp/cls_trace"
        os.system(f"rm -rf {tdir}")

        @jax.jit
        def run(state, batch, key):
            keys = jax.random.split(key, 30)

            def body(st, k):
                st, m = step(st, batch, k)
                return st, m["loss"]

            _, losses = jax.lax.scan(body, state, keys)
            return losses[-1]

        float(run(state, batch, jax.random.PRNGKey(0)))
        with jax.profiler.trace(tdir, create_perfetto_trace=True):
            float(run(state, batch, jax.random.PRNGKey(1)))
        # aggregate device ops from the trace proto
        sys.path.insert(0, os.path.dirname(__file__))
        from trace_tools import summarize_trace  # noqa

        summarize_trace(tdir, steps=30)


if __name__ == "__main__":
    main()
