#!/usr/bin/env python
"""Benchmark: classification throughput vs the reference classifier.

Fixture (cached in .bench_cache/, generated once): a bact10-shaped synthetic
DB — the real b10 taxonomy/strain tables read from the reference checkout,
with ~2M random discriminative probes — plus 200k × 150bp paired-style
FASTQ.GZ reads with a realistic hit profile (most reads hit 1-3 probes of one
target, some mixed, some unclassified, low-quality tails to exercise trim).

Baseline: the reference classifier (kmer_read_vf6.cpp compiled with its hash
table reduced 2^30→2^26 — a memory-only change that, if anything, *helps* its
cache locality), timed as (full job − tiny job) to exclude DB text-parse
time.  Cached in .bench_cache/baseline.json.

Ours: end-to-end sample processing (gz decode → trim/pack → device classify →
counts) on the packed DB, steady-state after one warmup pass.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

from __future__ import annotations

import gzip
import json
import os
import subprocess
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, ROOT)
CACHE = os.path.join(ROOT, ".bench_cache")
REF = "/root/reference"

N_PROBES = 2_000_000
N_READS = 200_000
READ_LEN = 150
SEED = 20260817


def log(msg):
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


# ----------------------------------------------------------------- fixture


def _gen_fixture():
    from kmer_id_tpu.core import codec

    os.makedirs(CACHE, exist_ok=True)
    done = os.path.join(CACHE, "fixture.json")
    if os.path.exists(done):
        return json.load(open(done))
    rng = np.random.default_rng(SEED)
    log("generating fixture (one-time)...")

    wdir = os.path.join(CACHE, "bench10")
    os.makedirs(wdir, exist_ok=True)
    # bact10-shaped metadata from the reference checkout (read-only inputs)
    data_src = os.path.join(REF, "b10", "bData10.txt")
    tree_src = os.path.join(REF, "b10", "btree_10.txt")
    if os.path.exists(data_src):
        data_txt = open(data_src).read()
        tree_txt = open(tree_src).read()
        num_targ = 5982
    else:  # fallback synthetic taxonomy
        num_targ = 5982
        rows = [f"{rng.integers(2, num_targ)}\tACC{i:06d}" for i in range(14791)]
        data_txt = "\n".join(rows) + "\n"
        tree_txt = "\n".join(
            f"1\t{t}" for t in range(2, num_targ)
        ) + "\n"
    open(os.path.join(wdir, "bench10_data.txt"), "w").write(data_txt)
    open(os.path.join(wdir, "bench10_tree.txt"), "w").write(tree_txt)

    # probes: random canonical keys, targets drawn from real target ids
    targs_pool = np.array(
        sorted({int(l.split()[0]) for l in data_txt.splitlines() if l.strip()}),
        dtype=np.int32,
    )
    targs_pool = targs_pool[targs_pool > 1]
    raw = rng.integers(0, 1 << 60, size=int(N_PROBES * 1.1), dtype=np.uint64)
    canon = np.minimum(raw, np.array([_revcomp_vec(raw)])[0])
    keys = np.unique(canon)[:N_PROBES]
    rng.shuffle(keys)
    targets = targs_pool[rng.integers(0, len(targs_pool), size=len(keys))]
    log(f"writing {len(keys)} probes...")
    with gzip.open(os.path.join(wdir, "bench10_probes.txt.gz"), "wt", compresslevel=1) as f:
        strings = _keys_to_strings(keys)
        for i, s in enumerate(strings):
            f.write(f"{s},{targets[i]},0,0,F,3\n")

    # reads
    log(f"writing {N_READS} reads...")
    base_chars = np.frombuffer(b"ACGT", dtype=np.uint8)
    reads = base_chars[rng.integers(0, 4, size=(N_READS, READ_LEN))]
    kinds = rng.random(N_READS)
    probe_strings = strings[:100_000]
    ptargets = targets[:100_000]
    by_target: dict[int, list[int]] = {}
    for i, t in enumerate(ptargets):
        by_target.setdefault(int(t), []).append(i)
    tlist = [t for t, v in by_target.items() if len(v) >= 3]
    for r in range(N_READS):
        if kinds[r] < 0.6:  # consistent: 1-3 probes of one target
            t = tlist[int(rng.integers(len(tlist)))]
            pis = by_target[t]
            for j in range(int(rng.integers(1, 4))):
                p = probe_strings[pis[int(rng.integers(len(pis)))]]
                pos = int(rng.integers(0, READ_LEN - 30))
                reads[r, pos : pos + 30] = np.frombuffer(p.encode(), np.uint8)
        elif kinds[r] < 0.7:  # mixed targets
            for j in range(2):
                p = probe_strings[int(rng.integers(len(probe_strings)))]
                pos = int(rng.integers(0, READ_LEN - 30))
                reads[r, pos : pos + 30] = np.frombuffer(p.encode(), np.uint8)
        # else: random/unclassified
    qual = np.full((N_READS, READ_LEN), ord("J"), dtype=np.uint8)
    tail = rng.random(N_READS) < 0.1
    qual[tail, READ_LEN - 25 :] = ord("#")
    with gzip.open(os.path.join(CACHE, "reads.fastq.gz"), "wb", compresslevel=1) as f:
        chunks = []
        for r in range(N_READS):
            chunks.append(
                b"@r%d\n%s\n+\n%s\n"
                % (r, reads[r].tobytes(), qual[r].tobytes())
            )
            if len(chunks) >= 10000:
                f.write(b"".join(chunks))
                chunks = []
        f.write(b"".join(chunks))

    meta = {"wdir": wdir, "reads": os.path.join(CACHE, "reads.fastq.gz"),
            "n_reads": N_READS, "num_targ": num_targ}
    json.dump(meta, open(done, "w"))
    return meta


def _revcomp_vec(keys: np.ndarray) -> np.ndarray:
    """Vectorized 60-bit reverse complement."""
    k = keys.copy()
    out = np.zeros_like(k)
    three = np.uint64(3)
    for _ in range(30):
        out = (out << np.uint64(2)) | ((three - (k & three)) & three)
        k >>= np.uint64(2)
    return out


def _keys_to_strings(keys: np.ndarray) -> np.ndarray:
    """Vectorized key -> 30-char string array."""
    shifts = np.array([2 * (29 - j) for j in range(30)], dtype=np.uint64)
    codes = ((keys[:, None] >> shifts[None, :]) & np.uint64(3)).astype(np.uint8)
    chars = np.frombuffer(b"ACGT", dtype=np.uint8)[codes]
    return np.array([row.tobytes().decode() for row in chars])


# ----------------------------------------------------------------- baseline


def _reference_baseline(meta) -> float:
    """Reference reads/sec, cached. (full job − 1-read job) wall time."""
    bl_path = os.path.join(CACHE, "baseline.json")
    if os.path.exists(bl_path):
        return json.load(open(bl_path))["reads_per_sec"]
    sys.path.insert(0, os.path.join(ROOT, "tests"))
    import golden_harness as gh

    binary = gh._compile(
        "kmer_read_vf6.cpp",
        "ref_read_vf6_bench",
        [("const itype MAXHASH = (1 << 30);", "const itype MAXHASH = (1 << 26);")],
    )
    if binary is None:
        return 0.0
    workdir = os.path.join(CACHE, "refrun")
    os.makedirs(os.path.join(workdir, "jobs"), exist_ok=True)
    os.makedirs(os.path.join(workdir, "bench10"), exist_ok=True)
    for f in os.listdir(meta["wdir"]):
        src = os.path.join(meta["wdir"], f)
        dst = os.path.join(workdir, "bench10", f)
        if not os.path.exists(dst):
            os.link(src, dst)
    # tiny job: first 100 reads
    tiny = os.path.join(CACHE, "reads_tiny.fastq.gz")
    if not os.path.exists(tiny):
        with gzip.open(meta["reads"], "rb") as fi, gzip.open(tiny, "wb") as fo:
            for _ in range(400):
                fo.write(fi.readline())
    open(os.path.join(workdir, "jobs", "jobs.txt"), "w").write(
        f"tiny 1\n{tiny}\nfull 1\n{meta['reads']}\n"
    )

    def run_job(jobs_content):
        open(os.path.join(workdir, "jobs", "jobs.txt"), "w").write(jobs_content)
        t0 = time.time()
        r = subprocess.run(
            [binary, "-name", "bench10", "-jname", "jobs"],
            cwd=workdir, capture_output=True, text=True, timeout=3600,
        )
        assert r.returncode == 0, r.stdout[-500:] + r.stderr[-500:]
        return time.time() - t0

    log("warming reference caches (tiny job)...")
    run_job(f"tiny 1\n{tiny}\n")  # page-cache/alloc warmup, discarded
    log("timing reference (tiny job)...")
    t_tiny = run_job(f"tiny 1\n{tiny}\n")
    log(f"  tiny: {t_tiny:.1f}s (DB load + 100 reads)")
    log("timing reference (full job)...")
    t_full = run_job(f"full 1\n{meta['reads']}\n")
    log(f"  full: {t_full:.1f}s")
    dt = max(t_full - t_tiny, 1e-3)
    rps = (meta["n_reads"] - 100) / dt
    json.dump(
        {"reads_per_sec": rps, "t_tiny": t_tiny, "t_full": t_full},
        open(bl_path, "w"),
    )
    log(f"reference baseline: {rps:,.0f} reads/s")
    return rps


# ----------------------------------------------------------------- ours


def _our_throughput(meta) -> tuple[float, dict]:
    from kmer_id_tpu.config import ClassifyConfig
    from kmer_id_tpu.engine.pipeline import SampleProcessor, load_db, make_classifier
    from kmer_id_tpu.io.fastx import iter_fastq_gz

    wdir = meta["wdir"]
    t0 = time.time()
    db = load_db(
        os.path.join(wdir, "bench10_data.txt"),
        os.path.join(wdir, "bench10_tree.txt"),
        os.path.join(wdir, "bench10_probes.txt.gz"),
        num_targ=meta["num_targ"],
        cache_dir=os.path.join(CACHE, "packed"),
    )
    t_load = time.time() - t0
    log(f"DB load: {t_load:.1f}s ({len(db.packed)} probes)")

    cfg = ClassifyConfig.preset("vf6", batch_size=8192, max_len=160)
    clf = make_classifier(db, cfg, cache_dir=os.path.join(CACHE, "packed"))

    # warmup: compile on a small slice
    warm = SampleProcessor(clf, cfg)
    recs = iter_fastq_gz(meta["reads"])
    warm_records = [next(recs) for _ in range(4096)]
    warm.feed(warm_records)
    warm.finish()
    log("warmup/compile done")

    t0 = time.time()
    sp = SampleProcessor(clf, cfg)
    sp.feed_file(meta["reads"], fmt="fastq_gz")
    res = sp.finish()
    dt = time.time() - t0
    rps = res.reads / dt
    log(f"ours: {res.reads} reads in {dt:.2f}s -> {rps:,.0f} reads/s "
        f"(classified {100 * (1 - res.gcount[0] / max(res.reads, 1)):.1f}%)")
    return rps, {"db_load_s": round(t_load, 2), "wall_s": round(dt, 2),
                 "reads": int(res.reads)}


def main():
    meta = _gen_fixture()
    ref_rps = _reference_baseline(meta)
    ours_rps, extra = _our_throughput(meta)
    out = {
        "metric": "reads_per_sec_per_chip",
        "value": round(ours_rps, 1),
        "unit": "reads/s",
        "vs_baseline": round(ours_rps / ref_rps, 3) if ref_rps else None,
        "baseline_reads_per_sec": round(ref_rps, 1),
        **extra,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
