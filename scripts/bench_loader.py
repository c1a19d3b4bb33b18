"""Input-pipeline micro-bench (VERDICT r1 item #10 acceptance).

Measures host feed rates for the two ImageNet-scale paths:
  1. spack: pre-sized uint8 records gathered by the mmap C++ reader —
     the packed-shard fast path (no decode);
  2. PIL decode+resize on the parallel_decode thread pool vs serial —
     the HF-datasets path.

Target: ≥10k img/s feed at 224×224 on the packed path.

Run: python scripts/bench_loader.py [--n 8192] [--batch 256]
"""

import argparse
import io
import sys
import tempfile
import time

sys.path.insert(0, ".")

import numpy as np


def bench_spack(n, batch, size=224):
    from salun.data.pack import SpackDataset, pack_arrays

    rng = np.random.RandomState(0)
    data = rng.randint(0, 255, (n, size, size, 3), np.uint8)
    labels = rng.randint(0, 1000, (n,)).astype(np.int64)
    with tempfile.NamedTemporaryFile(suffix=".spack") as f:
        t0 = time.perf_counter()
        pack_arrays(f.name, data, labels)
        t_pack = time.perf_counter() - t0

        ds = SpackDataset(f.name, (size, size, 3), 1000)
        idx = rng.permutation(n)
        # warm the page cache, then measure steady-state gather
        for s in range(0, n, batch):
            ds.batch(idx[s:s + batch])
        t0 = time.perf_counter()
        for s in range(0, n, batch):
            ds.batch(idx[s:s + batch])
        dt = time.perf_counter() - t0
    print(f"spack gather ({size}px): {n/dt:,.0f} img/s "
          f"(pack: {n/t_pack:,.0f} img/s) native={ds.reader.native}")
    return n / dt


def bench_pil(n, batch, size=224):
    from PIL import Image

    from salun.data.pipeline import parallel_decode

    rng = np.random.RandomState(0)
    # JPEG-encoded in-memory sources (realistic decode cost)
    blobs = []
    for _ in range(min(n, 512)):
        arr = rng.randint(0, 255, (256, 256, 3), np.uint8)
        b = io.BytesIO()
        Image.fromarray(arr).save(b, "JPEG", quality=85)
        blobs.append(b.getvalue())
    records = [blobs[i % len(blobs)] for i in range(n)]

    def decode(blob):
        img = Image.open(io.BytesIO(blob)).convert("RGB")
        return np.asarray(img.resize((size, size), Image.BILINEAR), np.uint8)

    t0 = time.perf_counter()
    for s in range(0, min(n, 1024), batch):
        np.stack([decode(r) for r in records[s:s + batch]])
    serial = min(n, 1024) / (time.perf_counter() - t0)

    dec = parallel_decode(decode)
    t0 = time.perf_counter()
    for s in range(0, n, batch):
        dec.map(records[s:s + batch])
    par = n / (time.perf_counter() - t0)
    import os
    print(f"PIL decode+resize: serial {serial:,.0f} img/s → "
          f"thread-pool {par:,.0f} img/s ({par/serial:.1f}x on "
          f"{os.cpu_count()} host core(s); scaling needs cores — PIL "
          f"releases the GIL, the pool is core-bound)")
    return par


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8192)
    ap.add_argument("--batch", type=int, default=256)
    args = ap.parse_args()
    spack_rate = bench_spack(args.n, args.batch)
    bench_pil(args.n // 4, args.batch)
    status = "OK" if spack_rate >= 10_000 else "BELOW-TARGET"
    print(f"packed-path target ≥10k img/s: {status}")


if __name__ == "__main__":
    main()
