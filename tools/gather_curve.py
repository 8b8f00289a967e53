#!/usr/bin/env python
"""Measure the chip's random-row-gather rate vs table size AND index shape.

The size curve is the fp engine's design driver (PERF.md): gathers are
transaction-bound and small tables gather several times faster than large
ones.  It also decides the Bloom pre-filter cap (db/fpdb.BLOOM_MAX_BLOCKS):
the filter only pays while its table gathers meaningfully faster than the
L1 table it gates.

``--shapes`` runs the round-5 INDEX-SHAPE experiment instead: at a FIXED
lane count, gather cost depends on the index plane's total-lane 2-adic
divisibility — [odd, 128] layouts run 25-37% faster than [8192, K] / flat
power-of-two shapes (1.07M lanes into 134 MB: 12.3 -> 7.7 ms; 98k lanes:
1.55 -> 1.07 ms).  ops/lookup.take_rows exploits this for every narrow
post-compaction gather in the engine.

    python tools/gather_curve.py [--sizes-mb 2 8 16 33 67 134 268 536 1072]
    python tools/gather_curve.py --shapes
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def _shape_experiment(iters: int) -> None:
    import jax
    import jax.numpy as jnp

    tab = jax.device_put(
        np.arange(8388608 * 4, dtype=np.uint32).reshape(8388608, 4)
    )
    out = {}
    for shape in [(8192, 131), (8385, 128), (8192, 128), (8384, 128),
                  (4191, 256), (2095, 512), (1047, 1024), (16766, 64),
                  (8192, 12), (769, 128), (768, 128), (513, 128),
                  (512, 128)]:
        idx = jnp.asarray(
            np.random.default_rng(1).integers(
                0, tab.shape[0], size=shape
            ).astype(np.int32)
        )

        @jax.jit
        def run(t, ix, iters):
            def step(i, acc):
                r = jnp.take(t, (ix + i) % t.shape[0], axis=0)
                return acc + r[..., 0].sum()

            return jax.lax.fori_loop(0, iters, step, jnp.uint32(0))

        int(np.asarray(run(tab, idx, 2)))
        t0 = time.time()
        int(np.asarray(run(tab, idx, iters)))
        dt = (time.time() - t0) / iters * 1e3
        n = int(np.prod(shape))
        v2 = (n & -n).bit_length() - 1  # 2-adic valuation of the lane count
        out[str(shape)] = round(dt, 3)
        print(f"[gather] {str(shape):14s} n={n:8d} 2^{v2:<2d} {dt:8.3f} ms",
              file=sys.stderr, flush=True)
    print(json.dumps(out))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes-mb", type=int, nargs="+",
                    default=[2, 8, 16, 33, 67, 134, 268, 536, 1072])
    ap.add_argument("--queries", type=int, default=1 << 20)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--row-bytes", type=int, default=16,
                    help="gather row width (16 = the fp tables' format)")
    ap.add_argument("--shapes", action="store_true",
                    help="index-shape experiment at fixed lane counts")
    args = ap.parse_args()
    if args.shapes:
        return _shape_experiment(args.iters * 4)

    import jax
    import jax.numpy as jnp

    q = args.queries
    w = args.row_bytes // 4
    out = {}
    for mb in args.sizes_mb:
        rows = mb * (1 << 20) // args.row_bytes
        # host-built table shipped with device_put: a device-side
        # arange+reshape [N, w] can pick a lane-padded layout on this chip
        # (w -> 128) and blow the alloc at >0.5 GB sizes
        tab = jax.device_put(
            np.arange(rows * w, dtype=np.uint32).reshape(rows, w)
        )
        # index shape [B, P] mimics the engine's per-window gather plane
        idx = jnp.asarray(
            np.random.default_rng(1)
            .integers(0, rows, size=q, dtype=np.int64)
            .reshape(8192, -1)
        ).astype(jnp.int32)

        @jax.jit
        def run(t, ix, iters):
            def step(i, acc):
                r = jnp.take(t, (ix + i) % rows, axis=0)
                return acc + r[..., 0].sum()

            return jax.lax.fori_loop(0, iters, step, jnp.uint32(0))

        int(np.asarray(run(tab, idx, 2)))  # compile + warm
        t0 = time.time()
        int(np.asarray(run(tab, idx, args.iters)))
        dt = (time.time() - t0) / args.iters
        rate = q / dt / 1e6
        out[f"{mb}MB"] = round(rate, 1)
        print(f"[gather] {mb:5d} MB: {rate:8.1f} M rows/s "
              f"({dt * 1e3:.2f} ms / {q >> 20}M gathers)", file=sys.stderr,
              flush=True)
        del tab
    print(json.dumps(out))


if __name__ == "__main__":
    main()
