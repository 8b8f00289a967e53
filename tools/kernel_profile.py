#!/usr/bin/env python
"""Stage-level device-kernel profiling on the real chip (bench-scale DB).

Measurement discipline (PERF.md): every timing is an IN-JIT fori_loop over
ITERS iterations with row-rolled (salted) inputs so XLA cannot hoist the
body, and ends in a scalar fetch (block_until_ready does not reliably sync
over the axon tunnel).  Both jit signatures are compiled before any timing.

Usage:  python tools/kernel_profile.py [--iters 20] [--stages ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
CACHE = os.path.join(ROOT, ".bench_cache")

B, L = 8192, 160
ITERS = 20


def log(m):
    print(f"[kprof] {m}", file=sys.stderr, flush=True)


def load_engine():
    from kmer_id_tpu.config import ClassifyConfig
    from kmer_id_tpu.engine.pipeline import load_db, make_classifier

    wdir = os.path.join(CACHE, "bench10")
    db = load_db(
        os.path.join(wdir, "bench10_data.txt"),
        os.path.join(wdir, "bench10_tree.txt"),
        os.path.join(wdir, "bench10_probes.txt.gz"),
        num_targ=5982,
        cache_dir=os.path.join(CACHE, "packed_full"),
    )
    cfg = ClassifyConfig.preset("vf6", batch_size=B, max_len=L)
    clf = make_classifier(db, cfg, cache_dir=os.path.join(CACHE, "packed_full"))
    return db, clf


def make_codes(db, clf, mixed_frac: float):
    """[B, L] uint8 code planes: reads with 1-3 planted probes of one target;
    a mixed_frac tail plants 2 probes of random (incomparable) targets."""
    rng = np.random.default_rng(7)
    packed = db.packed
    n = min(len(packed), 100_000)
    keys = (packed.hi[:n].astype(np.uint64) << np.uint64(32)) | packed.lo[:n]
    shifts = np.array([2 * (29 - j) for j in range(30)], dtype=np.uint64)
    pcm = ((keys[:, None] >> shifts[None, :]) & np.uint64(3)).astype(np.uint8)
    targets = packed.target[:n]
    order = np.argsort(targets, kind="stable")
    ts = targets[order]
    tvals, tstart, tcount = np.unique(ts, return_index=True, return_counts=True)
    ok = tcount >= 3
    tvals, tstart, tcount = tvals[ok], tstart[ok], tcount[ok]

    codes = rng.integers(0, 4, size=(B, L), dtype=np.uint8)
    nmix = int(B * mixed_frac)
    ci = np.arange(B - nmix)
    tsel = rng.integers(0, len(tvals), size=len(ci))
    nplant = rng.integers(1, 4, size=len(ci))
    for j in range(3):
        m = nplant > j
        rows = ci[m]
        pidx = order[tstart[tsel[m]] + rng.integers(0, 1 << 31, size=len(rows)) % tcount[tsel[m]]]
        pos = rng.integers(0, L - 30, size=len(rows))
        idx = pos[:, None] + np.arange(30)[None, :]
        codes[rows[:, None], idx] = pcm[pidx]
    mi = np.arange(B - nmix, B)
    for j in range(2):
        pidx = rng.integers(0, len(pcm), size=len(mi))
        pos = rng.integers(0, L - 30, size=len(mi))
        idx = pos[:, None] + np.arange(30)[None, :]
        codes[mi[:, None], idx] = pcm[pidx]
    lengths = np.full(B, L, dtype=np.int32)
    return codes, lengths


def timed(name, build_fn, iters=ITERS):
    """build_fn() -> jitted callable f(i) whose output is a scalar; times
    an in-jit loop of f over rolled inputs."""
    import jax
    import jax.numpy as jnp

    f = build_fn()
    # compile + one warm pass
    float(np.asarray(f(iters)))
    t0 = time.time()
    out = f(iters)
    float(np.asarray(out))
    dt = (time.time() - t0) / iters * 1000
    log(f"{name:44s} {dt:8.2f} ms/batch")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=ITERS)
    ap.add_argument("--mixed", type=float, default=0.1)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from kmer_id_tpu.engine import fpclassify as F
    from kmer_id_tpu.ops.extract import extract_kmers
    from kmer_id_tpu.ops.lookup import fp_candidates

    db, clf = load_engine()
    dbd = clf._db
    results = {}

    for label, frac in (("consistent", 0.0), ("mixed", args.mixed)):
        codes_np, lengths_np = make_codes(db, clf, frac)
        codes = jnp.asarray(codes_np)
        lengths = jnp.asarray(lengths_np)
        log(f"--- fixture: {label} ({frac:.0%} incomparable 2-target reads)")

        def loop(body):
            """fori_loop wrapper: body(dbd, codes_i) -> scalar contribution.
            The DB dict rides as a jit ARGUMENT — closing over device arrays
            would embed them as constants (3 GB remote-compile payload)."""
            def build():
                @jax.jit
                def run(d, cds, iters):
                    def step(i, acc):
                        c = jnp.roll(cds, i, axis=0)
                        return acc + body(d, c)
                    return jax.lax.fori_loop(0, iters, step, jnp.int32(0))
                return lambda iters: run(dbd, codes, iters)
            return build

        def ex_only(c):
            ex = extract_kmers(c, lengths)
            return ex["hi"].sum().astype(jnp.int32)

        def cand(c):
            ex = extract_kmers(c, lengths)
            planes = fp_candidates(dbd, ex["hi"], ex["lo"], ex["valid"])
            return sum(p[0].sum() for p in planes).astype(jnp.int32)

        def compact_verify(c):
            ex = extract_kmers(c, lengths)
            cv = F._compact_verify(dbd, ex, clf.max_hits)
            return cv["nh"].sum() + cv["deepest"].sum()

        def finals_noseen(c):
            ex = extract_kmers(c, lengths)
            seen0 = jnp.zeros((1,), jnp.int8)  # dummy: measure w/o big scatter
            # inline fp_finals minus the seen scatter
            cv = F._compact_verify(dbd, ex, clf.max_hits)
            from kmer_id_tpu.ops.fold import fold_targets_interval
            b = ex["hi"].shape[0]
            st = dbd["slot_target"]
            t = jnp.where(cv["ver"], jnp.take(st, cv["cand"].reshape(-1)).reshape(b, clf.max_hits), 0)
            dtgt = jnp.take(st, cv["deepest"])
            need_fold = jnp.any(~cv["consistent"] & (cv["nh"] > 0))
            folded = jax.lax.cond(
                need_fold,
                lambda: fold_targets_interval(dbd["chain3"], t),
                lambda: jnp.zeros((b,), jnp.int32),
            )
            finals = jnp.where(cv["consistent"], jnp.where(cv["nh"] > 0, dtgt, 0), folded)
            return finals.sum()

        def full(c):
            seen = jnp.zeros((clf.fpdb.n_slots,), jnp.int8)
            finals, seen = F.fp_finals(dbd, extract_kmers(c, lengths), seen, clf.max_hits)
            return finals.sum() + seen[0].astype(jnp.int32)

        results[f"{label}/extract"] = timed("extract", loop(ex_only), args.iters)
        results[f"{label}/+candidates"] = timed("+ fp candidates (L1+L2 gathers)", loop(cand), args.iters)
        results[f"{label}/+compact_verify"] = timed("+ compact + verify", loop(compact_verify), args.iters)
        results[f"{label}/+fold"] = timed("+ target map + fold", loop(finals_noseen), args.iters)
        results[f"{label}/full"] = timed("full finals (with seen scatter)", loop(full), args.iters)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
