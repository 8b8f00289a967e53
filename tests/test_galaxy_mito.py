"""Galaxy mitokmer flow end-to-end on the real 1a.fasta test input.

The reference's only automated test is the Galaxy functional block
(mitokmer.xml:64-70), which is unrunnable from its repo because the mito
probe DB and expected CSV are absent.  Here the DB is REBUILT with the
production builder from synthetic genomes seeded with the real 1a.fasta
reads (tools/mito_rebuild_demo.py does the full 11k-org version), and the
tool flow (classify single-end + CRLF-refkey rollup) must produce a
well-formed CSV with the seeded reads classified.
"""

import os
import subprocess
import sys

import pytest

jax = pytest.importorskip("jax")

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"


@pytest.mark.skipif(
    not os.path.exists(os.path.join(REF, "1a.fasta")), reason="reference data absent"
)
def test_galaxy_mitokmer_flow(tmp_path):
    sys.path.insert(0, os.path.join(ROOT, "tools"))
    import mito_rebuild_demo as demo

    w = demo.synth_world(str(tmp_path), n_orgs=80, genome_len=2500, seed_reads=40)
    from kmer_id_tpu.db.build import build_probes

    res = build_probes("mito", w["fadir"] + "/", root=str(tmp_path))
    assert len(res.records) > 1000

    import gzip
    import shutil

    wdir = w["wdir"]
    with open(os.path.join(wdir, "mito_probes.txt"), "rb") as fi, gzip.open(
        os.path.join(wdir, "mitochondria_probes.txt.gz"), "wb"
    ) as fo:
        shutil.copyfileobj(fi, fo)
    shutil.copy(os.path.join(wdir, "mito_data.txt"),
                os.path.join(wdir, "mitochondria_data.txt"))
    shutil.copy(os.path.join(wdir, "mito_tree.txt"),
                os.path.join(wdir, "mitochondria_tree.txt"))
    shutil.copy(os.path.join(REF, "mitochondria_refkey.txt"),
                os.path.join(wdir, "mitochondria_refkey.txt"))

    outdir = str(tmp_path / "out")
    r = subprocess.run(
        [sys.executable, "-m", "kmer_id_tpu.cli", "mitokmer",
         "-w", wdir, "-d", outdir,
         "-i", os.path.join(REF, "1a.fasta"), "none", "--strip-cr"],
        cwd=ROOT, capture_output=True, text=True, timeout=1200,
    )
    assert r.returncode == 0, r.stdout[-1500:] + r.stderr[-1500:]
    lines = open(os.path.join(outdir, "mitokmer_result.csv")).read().splitlines()
    assert lines[0] == "taxid,reads,abundance"
    assert lines[1].startswith("total,208.0")
    noid = int(lines[2].split(",")[1])
    assert noid < 208  # seeded reads classified
    # abundance column normalizes to ~100 over classified rows
    ab = sum(float(l.split(",")[2]) for l in lines[3:] if l.split(",")[2])
    assert abs(ab - 100.0) < 1.0
