"""Profile the composed SD random_label step at the real v1 shape.

VERDICT r4 weak #4 / next #3: the only SD number on record was batch-1
(MFU 0.3736); nobody had profiled the composed step at the recipe batch
size 8 (SD/train-scripts/random_label.py:236). This script measures the
step (uncached vs cached-moments modes, masked vs not) on the live chip,
logs AOT + steady-state timings, and optionally captures an XLA trace.

Usage:
  python scripts/profile_sd_step.py --batch 8 --mode forget
  python scripts/profile_sd_step.py --batch 8 --mode uncached --trace /tmp/tr
"""

import argparse
import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from salun.utils.tpu_bench import enable_compile_cache

enable_compile_cache()


def log(obj):
    print(json.dumps(obj), file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--mode", choices=["uncached", "forget", "all"],
                    default="uncached")
    ap.add_argument("--no-mask", action="store_true")
    ap.add_argument("--iters", type=int, default=3,
                    help="scan length per timed call")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--trace", type=str, default=None)
    ap.add_argument("--mu_bf16", action="store_true",
                    help="store Adam's first moment in bf16 (saves 1.7 GB "
                         "for the 860M-param U-Net; slight numerics "
                         "deviation vs the reference's f32 torch Adam)")
    ap.add_argument("--no_remat", action="store_true",
                    help="disable block remat (the reference trains WITH "
                         "use_checkpoint; no-remat needs >16 GB at bs 8)")
    args = ap.parse_args()

    import optax

    from salun.core import threshold_mask
    from salun.sd import SDModules, SDUNetConfig, VAEConfig
    from salun.sd.clip_text import CLIPTextConfig
    from salun.sd.trainers import (
        make_cache_batch_fn, make_random_label_step, with_mask,
    )

    b = args.batch
    modules = SDModules.create(
        SDUNetConfig(dtype=jnp.bfloat16, remat=not args.no_remat),
        VAEConfig(dtype=jnp.bfloat16),
        CLIPTextConfig(dtype=jnp.bfloat16),
        num_timesteps=1000)
    t0 = time.perf_counter()
    params = modules.init(jax.random.PRNGKey(0), image_size=64)
    jax.tree.leaves(params)[0].block_until_ready()
    log({"init_s": round(time.perf_counter() - t0, 1)})
    # keep the trainee ON DEVICE — r3's bench device_get/device_put
    # roundtrip of the 3.44 GB U-Net cost ~560 s through the tunnel
    # (BENCH_r03.json sd_start→sd_aot_start); there is no pristine copy,
    # so HBM holds one U-Net + moments + mask + frozen stages ≈ 12.9 GB
    # frozen stages stored bf16: they are inference-only and already
    # COMPUTE in bf16 (cfg.dtype); f32 storage wastes 413 MB of the
    # 15.75 GB budget (bs-4 OOM'd by 152 MB with f32 storage)
    frozen = jax.tree.map(lambda x: x.astype(jnp.bfloat16),
                          {"vae": params["vae"], "clip": params["clip"]})
    unet0 = params["unet"]
    del params

    @jax.jit
    def _mk_mask(unet_params):
        sal = jax.tree.map(
            lambda p: jnp.abs(jax.random.normal(
                jax.random.PRNGKey(1), p.shape)), unet_params)
        # int8: 0/1 exact, quarter the bf16 HBM footprint
        return jax.tree.map(lambda m: m.astype(jnp.int8),
                            threshold_mask(sal, 0.5))

    rng = np.random.RandomState(0)
    mask = None if args.no_mask else _mk_mask(unet0)
    tx = with_mask(optax.adam(1e-5, mu_dtype=jnp.bfloat16 if args.mu_bf16
                              else None), mask)
    carry = (unet0, tx.init(unet0))
    cached = False if args.mode == "uncached" else args.mode
    step = make_random_label_step(modules, tx, alpha=0.5, cached=cached)

    raw = {
        "forget_images": jnp.asarray(
            rng.rand(b, 512, 512, 3).astype(np.float32) * 2 - 1),
        "remain_images": jnp.asarray(
            rng.rand(b, 512, 512, 3).astype(np.float32) * 2 - 1),
        "forget_ids": jnp.asarray(rng.randint(0, 49408, (b, 77))),
        "pseudo_ids": jnp.asarray(rng.randint(0, 49408, (b, 77))),
        "remain_ids": jnp.asarray(rng.randint(0, 49408, (b, 77))),
    }
    if cached:
        cache_fn = make_cache_batch_fn(modules, cached)
        t0 = time.perf_counter()
        batch = cache_fn({**frozen}, raw)
        jax.tree.leaves(batch)[0].block_until_ready()
        log({"cache_batch_first_call_s":
             round(time.perf_counter() - t0, 2)})
        t0 = time.perf_counter()
        batch = cache_fn({**frozen}, raw)
        float(jnp.sum(jax.tree.leaves(batch)[0].astype(jnp.float32)))
        log({"cache_batch_steady_s": round(time.perf_counter() - t0, 3)})
        if cached == "all":
            frozen = {}
    else:
        batch = raw

    iters = args.iters

    # frozen as an ARGUMENT (closure capture embeds the 0.83 GB VAE/CLIP
    # params as HLO literals → remote-compile HTTP 413; tpu_bench rule)
    @partial(jax.jit, donate_argnums=0)
    def run(carry, frozen, batch, key):
        def body(c, k):
            c, loss = step(c, frozen, batch, k)
            return c, loss

        carry, losses = jax.lax.scan(body, carry,
                                     jax.random.split(key, iters))
        return carry, losses[-1]

    t0 = time.perf_counter()
    lowered = run.lower(carry, frozen, batch, jax.random.PRNGKey(1))
    log({"lower_s": round(time.perf_counter() - t0, 1)})
    t0 = time.perf_counter()
    compiled = lowered.compile()
    log({"compile_s": round(time.perf_counter() - t0, 1)})
    an = compiled.cost_analysis()
    if isinstance(an, (list, tuple)):
        an = an[0]
    flops = float(an.get("flops", 0.0)) / iters
    mem = compiled.memory_analysis()
    log({"flops_per_step": flops,
         "hbm_argument_gb": round(mem.argument_size_in_bytes / 2**30, 2),
         "hbm_output_gb": round(mem.output_size_in_bytes / 2**30, 2),
         "hbm_temp_gb": round(mem.temp_size_in_bytes / 2**30, 2)})

    carry, loss = compiled(carry, frozen, batch, jax.random.PRNGKey(2))
    float(loss)
    best = None
    for rep in range(args.reps):
        t0 = time.perf_counter()
        carry, loss = compiled(carry, frozen, batch,
                               jax.random.PRNGKey(3 + rep))
        float(loss)
        dt = (time.perf_counter() - t0) / iters
        log({"rep_s": round(dt, 4)})
        best = dt if best is None else min(best, dt)

    if args.trace:
        with jax.profiler.trace(args.trace):
            carry, loss = compiled(carry, frozen, batch,
                                   jax.random.PRNGKey(99))
            float(loss)
        log({"trace_dir": args.trace})

    kind = jax.devices()[0].device_kind.lower()
    peak = 918e12 if "v6" in kind else 197e12
    print(json.dumps({
        "mode": args.mode, "batch": b, "masked": not args.no_mask,
        "ms_per_step": round(best * 1e3, 1),
        "images_per_sec": round(b / best, 2),
        "flops_per_step": flops,
        "mfu": round(flops / best / peak, 4),
        "device": kind,
    }), flush=True)


if __name__ == "__main__":
    main()
