"""Decompose the SD step cost: VAE encode / CLIP / UNet fwd / fwd+bwd.

Diagnoses the r5 finding that the composed random_label step measures
~156 ms at bs 1 (no-remat, maskless) where BENCH_r03 recorded 27.4 ms.
Each part is AOT-compiled with params as ARGS and timed with a serial
carry chain + scalar fetch (tpu_bench rules).
"""

import argparse
import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from salun.utils.tpu_bench import enable_compile_cache

enable_compile_cache()


def log(o):
    print(json.dumps(o), flush=True)


def timeit(name, compiled, args, reps=5):
    out = compiled(*args)
    _force(out)
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        out = compiled(*args)
        _force(out)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    log({name: round(best * 1e3, 2)})
    return best


def _force(out):
    leaf = jax.tree.leaves(out)[0]
    float(jnp.sum(leaf.astype(jnp.float32)))


def aot(fn, *args):
    t0 = time.perf_counter()
    c = jax.jit(fn).lower(*args).compile()
    log({"compile_s": round(time.perf_counter() - t0, 1)})
    return c


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--remat", action="store_true")
    args = ap.parse_args()
    b = args.batch

    from salun.sd import SDModules, SDUNetConfig, VAEConfig
    from salun.sd.clip_text import CLIPTextConfig

    modules = SDModules.create(
        SDUNetConfig(dtype=jnp.bfloat16, remat=args.remat),
        VAEConfig(dtype=jnp.bfloat16),
        CLIPTextConfig(dtype=jnp.bfloat16),
        num_timesteps=1000)
    params = modules.init(jax.random.PRNGKey(0), image_size=64)
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.rand(b, 512, 512, 3).astype(np.float32) * 2 - 1)
    ids = jnp.asarray(rng.randint(0, 49408, (b, 77)))
    z = jnp.asarray(rng.rand(b, 64, 64, 4).astype(np.float32))
    t = jnp.zeros((b,), jnp.float32)
    ctx = jnp.asarray(rng.rand(b, 77, 768).astype(np.float32))
    key = jax.random.PRNGKey(1)

    vae_enc = aot(lambda p, x, k: modules.encode_image(p, x, k),
                  params, imgs, key)
    timeit("vae_encode_ms", vae_enc, (params, imgs, key))

    clip_enc = aot(lambda p, i: modules.encode_text(p, i), params, ids)
    timeit("clip_encode_ms", clip_enc, (params, ids))

    unet_fwd = aot(lambda p, zz, tt, cc: modules.apply_model(p, zz, tt, cc),
                   params, z, t, ctx)
    timeit("unet_fwd_ms", unet_fwd, (params, z, t, ctx))

    def loss(up, p, zz, tt, cc):
        out = modules.apply_model(dict(p, unet=up), zz, tt, cc)
        return jnp.sum(jnp.square(out))

    unet_fb = aot(lambda p, zz, tt, cc: jax.value_and_grad(loss)(
        p["unet"], p, zz, tt, cc), params, z, t, ctx)
    timeit("unet_fwd_bwd_ms", unet_fb, (params, z, t, ctx))

    vae_dec = aot(lambda p, zz: modules.decode_latent(p, zz), params, z)
    timeit("vae_decode_ms", vae_dec, (params, z))


if __name__ == "__main__":
    main()
