#!/usr/bin/env python
"""Mitochondria-scale DB rebuild + Galaxy mitokmer flow, end to end.

The reference ships the mito metadata (11,007 orgs, ~17k taxonomy targets)
but not the genomes or the probe DB (SURVEY.md §2.3) — so this demo
synthesizes a genome per organism (deterministic), seeds a few of them with
the real ``1a.fasta`` Galaxy-test reads so classification is non-trivial,
rebuilds ``mitochondria_probes.txt.gz`` with the production builder, and
drives the full Galaxy tool flow (``cli mitokmer`` = kmer_read_m3.py):
classify ``1a.fasta`` single-end and roll up ``mitokmer_result.csv``
against the real (CRLF) refkey.

    python tools/mito_rebuild_demo.py --orgs 1000        # reduced
    python tools/mito_rebuild_demo.py                    # full 11,007 orgs
"""

from __future__ import annotations

import argparse
import gzip
import os
import shutil
import subprocess
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
REF = "/root/reference"


def synth_world(workdir: str, n_orgs: int, genome_len: int, seed_reads: int) -> dict:
    """wdir layout for build + classify from the real mito metadata."""
    from kmer_id_tpu.db.metadata import load_data_txt

    wdir = os.path.join(workdir, "mito")
    fadir = os.path.join(workdir, "fa")
    os.makedirs(wdir, exist_ok=True)
    os.makedirs(fadir, exist_ok=True)

    data_lines = open(os.path.join(REF, "mitochondria_data.txt")).read().splitlines()
    data_lines = [l for l in data_lines if l.strip()][:n_orgs]
    open(os.path.join(wdir, "mito_data.txt"), "w").write("\n".join(data_lines) + "\n")
    shutil.copy(
        os.path.join(REF, "mitochondria_tree.txt"), os.path.join(wdir, "mito_tree.txt")
    )
    open(os.path.join(wdir, "mito_filter.txt"), "w").write("")

    # real Galaxy-test reads; seed them into the first orgs' genomes so the
    # rebuilt DB actually classifies 1a.fasta
    reads = []
    acc = None
    for line in open(os.path.join(REF, "1a.fasta")):
        line = line.strip()
        if line.startswith(">"):
            acc = line
        elif line:
            reads.append(line)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    t0 = time.time()
    for i, dl in enumerate(data_lines):
        a = dl.split()[1]
        rng = np.random.default_rng(1000 + i)
        g = bases[rng.integers(0, 4, size=genome_len)]
        if i < seed_reads and i < len(reads):
            r = reads[i].encode()
            g[100 : 100 + len(r)] = np.frombuffer(r, dtype=np.uint8)
        with gzip.open(os.path.join(fadir, a + ".fasta.gz"), "wb", compresslevel=1) as f:
            f.write(b">%s\n" % a.encode())
            f.write(g.tobytes())
            f.write(b"\n")
        if (i + 1) % 2000 == 0:
            print(f"  genomes {i + 1}/{len(data_lines)} ({time.time() - t0:.0f}s)")
    return {"wdir": wdir, "fadir": fadir, "workdir": workdir}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--orgs", type=int, default=11007)
    ap.add_argument("--genome-len", type=int, default=16500)
    ap.add_argument("--seed-reads", type=int, default=120)
    ap.add_argument("--workdir", default="/tmp/mito_demo")
    args = ap.parse_args()

    os.makedirs(args.workdir, exist_ok=True)
    print(f"synthesizing {args.orgs} genomes...")
    t0 = time.time()
    w = synth_world(args.workdir, args.orgs, args.genome_len, args.seed_reads)
    print(f"genomes in {time.time() - t0:.0f}s")

    from kmer_id_tpu.db.build import build_probes

    t0 = time.time()
    res = build_probes("mito", w["fadir"] + "/", root=args.workdir)
    t_build = time.time() - t0
    print(
        f"build: {len(res.records)} probes over {res.num_targ} targets, "
        f"{res.table_size} distinct kmers, {t_build:.0f}s "
        f"({args.orgs / max(t_build, 1e-9):.0f} genomes/s)"
    )

    # package as the m3/Galaxy wdir contract
    gz = os.path.join(w["wdir"], "mitochondria_probes.txt.gz")
    with open(os.path.join(w["wdir"], "mito_probes.txt"), "rb") as fi, gzip.open(
        gz, "wb", compresslevel=1
    ) as fo:
        shutil.copyfileobj(fi, fo)
    shutil.copy(os.path.join(w["wdir"], "mito_data.txt"),
                os.path.join(w["wdir"], "mitochondria_data.txt"))
    shutil.copy(os.path.join(w["wdir"], "mito_tree.txt"),
                os.path.join(w["wdir"], "mitochondria_tree.txt"))
    shutil.copy(os.path.join(REF, "mitochondria_refkey.txt"),
                os.path.join(w["wdir"], "mitochondria_refkey.txt"))

    outdir = os.path.join(args.workdir, "galaxy_out")
    t0 = time.time()
    r = subprocess.run(
        [sys.executable, "-m", "kmer_id_tpu.cli", "mitokmer",
         "-w", w["wdir"], "-d", outdir,
         "-i", os.path.join(REF, "1a.fasta"), "none", "--strip-cr"],
        cwd=ROOT, capture_output=True, text=True,
    )
    print(r.stderr[-800:])
    assert r.returncode == 0, r.stdout[-2000:]
    csv = open(os.path.join(outdir, "mitokmer_result.csv")).read().splitlines()
    body = [l for l in csv[3:] if l.split(",")[1] not in ("0", "0.0")]
    print(f"galaxy flow: {time.time() - t0:.0f}s; csv rows={len(csv)}")
    print("\n".join(csv[:3] + body[:10]))


if __name__ == "__main__":
    main()
