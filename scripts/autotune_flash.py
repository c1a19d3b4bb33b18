"""Flash-attention block-size autotune (ROADMAP kernel item).

Sweeps (block_q, block_k) for the framework's hot attention shapes — the
SD 64×64-latent self-attentions (heads folded into batch) — timing the
Pallas forward and forward+backward against the XLA einsum path, and
prints a best-config table. The winning blocks are baked into
salun/kernels/attention.py's dispatch table.

Run on the TPU chip: python scripts/autotune_flash.py [--iters 20]
"""

import argparse
import itertools
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from salun.utils.tpu_bench import enable_compile_cache, scan_time

enable_compile_cache()

# (B=batch×heads, N, D): SD v1 self-attn at 64×64 is 8 heads × d40 per
# sample (320ch); d64/d128 cover the generic folded-head regimes.
SHAPES = [
    (8, 4096, 40),    # SD bs1, 320ch/8h
    (32, 4096, 40),   # SD bs4
    (16, 4096, 64),
    (8, 4096, 128),
]
BLOCK_Q = (128, 256, 512)
BLOCK_K = (256, 512, 1024)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    from salun.kernels.attention import _xla_attention
    from salun.kernels.flash_attention import flash_attention_trainable

    results = {}
    for (b, n, d) in SHAPES:
        key = jax.random.PRNGKey(0)
        kq, kk, kv = jax.random.split(key, 3)
        q = jax.random.normal(kq, (b, n, d), jnp.bfloat16)
        k = jax.random.normal(kk, (b, n, d), jnp.bfloat16)
        v = jax.random.normal(kv, (b, n, d), jnp.bfloat16)
        scale = d ** -0.5

        def bwd_of(fn):
            g = jax.grad(lambda q, k, v: jnp.sum(
                fn(q, k, v).astype(jnp.float32)), argnums=(0, 1, 2))

            def run(q, k, v):
                dq, dk, dv = g(q, k, v)
                return dq + dk + dv
            return run

        xla = lambda q, k, v: _xla_attention(q, k, v, scale)  # noqa: E731
        xla_fwd = scan_time(xla, q, k, v, iters=args.iters) * 1e3
        xla_bwd = scan_time(bwd_of(xla), q, k, v, iters=args.iters) * 1e3

        best = None
        for bq, bk in itertools.product(BLOCK_Q, BLOCK_K):
            if bq > n or bk > n:
                continue

            def fa(q, k, v, bq=bq, bk=bk):
                return flash_attention_trainable(q, k, v, scale, bq, bk)

            try:
                fwd = scan_time(fa, q, k, v, iters=args.iters) * 1e3
                bwd = scan_time(bwd_of(fa), q, k, v, iters=args.iters) * 1e3
            except Exception as e:
                print(json.dumps({"shape": [b, n, d], "bq": bq, "bk": bk,
                                  "error": repr(e)[:120]}), flush=True)
                continue
            rec = {"shape": [b, n, d], "bq": bq, "bk": bk,
                   "fwd_ms": round(fwd, 2), "fwdbwd_ms": round(bwd, 2),
                   "fwd_vs_xla": round(xla_fwd / fwd, 2),
                   "fwdbwd_vs_xla": round(xla_bwd / bwd, 2)}
            print(json.dumps(rec), flush=True)
            if best is None or bwd < best["fwdbwd_ms"]:
                best = rec
        if best is None:  # every tile failed to compile for this shape
            results[f"{b}x{n}x{d}"] = {"error": "all configs failed"}
            print(json.dumps({"BEST": None, "shape": [b, n, d]}), flush=True)
            continue
        best["xla_fwd_ms"] = round(xla_fwd, 2)
        best["xla_fwdbwd_ms"] = round(xla_bwd, 2)
        results[f"{b}x{n}x{d}"] = best
        print(json.dumps({"BEST": best}), flush=True)

    print(json.dumps({"summary": results}, indent=1))


if __name__ == "__main__":
    main()
