#!/usr/bin/env python
"""Tunnel/link micro-benchmarks: H2D/D2H per-transfer overhead vs bytes,
dispatch roundtrip, and grouped-fetch amortization.  Informs the pipeline's
transfer batching (engine/pipeline.py collector design)."""

from __future__ import annotations

import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def log(m):
    print(f"[link] {m}", file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    log(f"device: {dev}")

    @jax.jit
    def bump(x):
        return x + 1

    # dispatch + tiny-fetch roundtrip
    s = jnp.zeros((), jnp.int32)
    for _ in range(3):
        s = bump(s)
        int(s)
    t0 = time.time()
    n = 20
    for _ in range(n):
        s = bump(s)
        int(s)
    log(f"dispatch + scalar fetch roundtrip: {(time.time()-t0)/n*1000:.2f} ms")

    # H2D: one 400 KB array vs 3 arrays (327 KB + 32 KB + 4 KB)
    one = np.zeros(100_000, np.uint32)
    a = np.zeros(81_920, np.uint32)
    b = np.zeros(8_192, np.int32)
    c = np.zeros(1_024, np.int32)
    for arrs, name in (((one,), "1 x 400KB"), ((a, b, c), "327+32+4 KB")):
        # warm
        ds = [jnp.asarray(x) for x in arrs]
        int(sum(d[0].astype(jnp.int32) for d in ds))
        t0 = time.time()
        for i in range(n):
            arrs[0][0] = i  # defeat any caching
            ds = [jnp.asarray(x) for x in arrs]
            int(sum(d[0].astype(jnp.int32) for d in ds))
        log(f"H2D {name:14s}: {(time.time()-t0)/n*1000:.2f} ms/iter")

    # D2H: fetch [8192] i32 each iter vs [k*8192] every k iters
    @jax.jit
    def mk(i):
        return jnp.full((8192,), i, jnp.int32)

    for k in (1, 2, 4, 8):
        bufs = [mk(i) for i in range(k)]
        np.asarray(jnp.concatenate(bufs))  # warm both paths
        t0 = time.time()
        iters = 32
        for it in range(0, iters, k):
            bufs = [mk(it + j) for j in range(k)]
            out = np.asarray(jnp.concatenate(bufs)) if k > 1 else np.asarray(bufs[0])
            assert out.shape[0] == 8192 * k
        dt = (time.time() - t0) / iters * 1000
        log(f"D2H finals, fetch every {k} batches: {dt:.2f} ms/batch")


if __name__ == "__main__":
    main()
