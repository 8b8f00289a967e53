"""Byte-level parity vs the compiled reference C++ on a synthetic micro-world.

Pipeline under test (build → classify → report), golden = reference binaries:

* builder:   `<name>_probes.txt` and `<name>_count.txt` byte-identical;
* classifier (vf6 job mode): `<job>_result.txt` and `<job>_reads.txt`
  byte-identical for a .fasta job and a .fastq.gz job (trim exercised);
* report: readbatch_10.py (executed with patched paths) vs our rollup.
"""

import gzip
import os
import shutil
import subprocess

import numpy as np
import pytest

from kmer_id_tpu.core import codec
from tests import golden_harness as gh

rng = np.random.default_rng(20260817)
BASES = np.array(list("ACGT"))


def rand_dna(n):
    return "".join(BASES[rng.integers(0, 4, size=n)])


NAME = "tiny"


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    """Synthetic genomes/DB + reads, reference binaries compiled."""
    build_bin = gh.build_binary()
    read_bin = gh.classifier_vf6_binary()
    if not build_bin or not read_bin:
        pytest.skip("reference sources or g++ unavailable")

    root = tmp_path_factory.mktemp("golden")
    wdir = root / NAME
    wdir.mkdir()
    fadir = root / "fa"
    fadir.mkdir()

    shared = rand_dna(300)
    outg = rand_dna(250)
    uA1, uA2, uB1 = rand_dna(500), rand_dna(500), rand_dna(500)
    genomes = {
        "accA1": uA1 + shared + outg,
        "accA2": shared + uA2,
        "accB1": uB1,
        "accOUT": rand_dna(150) + outg,
    }
    all_keys = []
    for seq in genomes.values():
        k, _, _ = codec.canonical_kmers(codec.encode_bases(seq))
        all_keys.append(k)
    gh.assert_no_builder_collisions(np.concatenate(all_keys))

    for acc, seq in genomes.items():
        with gzip.open(fadir / f"{acc}.fasta.gz", "wt") as f:
            f.write(f">{acc} synthetic\n")
            for i in range(0, len(seq), 70):
                f.write(seq[i : i + 70] + "\n")
    (wdir / f"{NAME}_data.txt").write_text("3\taccA1\n4\taccA2\n6\taccB1\n")
    (wdir / f"{NAME}_tree.txt").write_text("1\t2\n2\t3\n2\t4\n1\t5\n5\t6\n")
    (wdir / f"{NAME}_filter.txt").write_text("accOUT\n")

    # reads: unique blocks, shared, shared+unique span, outgroup, random,
    # plus low-quality-tail fastq reads to exercise trimming
    reads = [
        ("r1", genomes["accA1"][100:200]),  # unique A1 -> 3
        ("r2", genomes["accA2"][-150:-50]),  # unique A2 -> 4
        ("r3", genomes["accB1"][50:150]),  # unique B1 -> 6
        ("r4", shared[20:120]),  # shared only -> 2
        ("r5", genomes["accA1"][460:560]),  # span unique(A1)+shared -> 3
        ("r6", outg[50:150]),  # outgroup-block -> 0
        ("r7", rand_dna(100)),  # random -> 0
        ("r8", genomes["accA2"][0:80]),  # shared -> 2
        ("r9", rand_dna(31)),
        ("r10", genomes["accB1"][200:420]),
    ]
    fa_path = root / "reads.fasta"
    with open(fa_path, "w") as f:
        for acc, seq in reads:
            f.write(f">{acc}\n{seq}\n")
    fq_path = root / "reads.fastq.gz"
    with gzip.open(fq_path, "wt") as f:
        for i, (acc, seq) in enumerate(reads):
            if i == 4:
                qual = "J" * (len(seq) - 40) + "#" * 40  # low-qual tail -> trim
            elif i == 2:
                qual = "#" * 10 + "J" * (len(seq) - 10)  # low-qual head
            elif i == 6:
                qual = "#" * len(seq)  # fully trimmed -> dropped
            else:
                qual = "J" * len(seq)
            f.write(f"@{acc}\n{seq}\n+\n{qual}\n")

    jdir = root / "jobs"
    jdir.mkdir()
    (jdir / "jobs.txt").write_text(f"fajob 1\n{fa_path}\nfqjob 1\n{fq_path}\n")

    # --- run reference builder
    r = gh.run(build_bin, ["-name", NAME, "-fadir", str(fadir) + "/"], cwd=str(root))
    assert r.returncode == 0, r.stdout + r.stderr
    ref_probes = (wdir / f"{NAME}_probes.txt").read_bytes()
    ref_counts = (wdir / f"{NAME}_count.txt").read_bytes()
    assert len(ref_probes) > 0
    # stash reference outputs, then let ours overwrite
    (root / "ref_probes.txt").write_bytes(ref_probes)
    (root / "ref_count.txt").write_bytes(ref_counts)

    gh.gzip_file(str(wdir / f"{NAME}_probes.txt"), str(wdir / f"{NAME}_probes.txt.gz"))

    # --- run reference classifier on both jobs
    r = gh.run(read_bin, ["-name", NAME, "-jname", "jobs"], cwd=str(root))
    assert r.returncode == 0, r.stdout + r.stderr
    ref_out = {}
    for job in ("fajob", "fqjob"):
        ref_out[job] = {
            "result": (jdir / f"{job}_result.txt").read_bytes(),
            "reads": (jdir / f"{job}_reads.txt").read_bytes(),
        }
        (jdir / f"{job}_result.txt").unlink()
        (jdir / f"{job}_reads.txt").unlink()
    return dict(
        root=root, wdir=wdir, fadir=fadir, jdir=jdir, genomes=genomes,
        ref_probes=ref_probes, ref_counts=ref_counts, ref_out=ref_out,
    )


def test_builder_bytes_match_reference(world):
    from kmer_id_tpu.db.build import build_probes

    res = build_probes(NAME, str(world["fadir"]) + "/", root=str(world["root"]))
    got_probes = (world["wdir"] / f"{NAME}_probes.txt").read_bytes()
    got_counts = (world["wdir"] / f"{NAME}_count.txt").read_bytes()
    assert got_probes == world["ref_probes"]
    assert got_counts == world["ref_counts"]
    assert len(res.records) > 10


def test_classifier_bytes_match_reference(world):
    from kmer_id_tpu.config import ClassifyConfig
    from kmer_id_tpu.engine.pipeline import load_db, run_vf6

    wdir, jdir = world["wdir"], world["jdir"]
    db = load_db(
        str(wdir / f"{NAME}_data.txt"),
        str(wdir / f"{NAME}_tree.txt"),
        str(wdir / f"{NAME}_probes.txt.gz"),
    )
    cfg = ClassifyConfig.preset("vf6", batch_size=16, max_len=128)
    run_vf6(NAME, "jobs", db, cfg=cfg, root=str(world["root"]))
    for job in ("fajob", "fqjob"):
        got_result = (jdir / f"{job}_result.txt").read_bytes()
        got_reads = (jdir / f"{job}_reads.txt").read_bytes()
        assert got_result == world["ref_out"][job]["result"], job
        assert got_reads == world["ref_out"][job]["reads"], job


def test_readbatch10_report_matches_reference_script(world, tmp_path):
    """Run the actual readbatch_10.py (paths patched) vs our rollup."""
    jdir = world["jdir"]
    # re-create result files from the reference goldens
    rdir = tmp_path / "results"
    rdir.mkdir()
    for job in ("fajob", "fqjob"):
        (rdir / f"{job}_result.txt").write_bytes(world["ref_out"][job]["result"])
    refkey = tmp_path / "refkey.txt"
    lines = ["target\tname\tkmer count\tin use"]
    names = {2: "GenusA", 3: "GenusA_sp1", 4: "GenusA_sp2", 5: "GenusB", 6: "GenusB_sp1"}
    counts = {}
    for line in (world["root"] / "ref_count.txt").read_text().splitlines():
        t, c = line.split(",")
        counts[int(t)] = int(c)
    for t in range(7):
        lines.append(f"{t}\t{names.get(t, 'none')}\t{counts.get(t, 0)}\t1")
    refkey.write_text("\n".join(lines) + "\n")

    src = open(os.path.join(gh.REF_DIR, "readbatch_10.py")).read()
    src = src.replace('dir1 = "/home/mmammel/fastq/"', f'dir1 = "{rdir}/"')
    src = src.replace('outname = "test_b10.csv"', f'outname = "{tmp_path}/ref.csv"')
    src = src.replace('reffile = "./bact10/refkey10.txt"', f'reffile = "{refkey}"')
    src = src.replace(
        "exclude_i = set([4178,1744,2539,5624,1575,5647,323,2728,268,5317,297,"
        "3867,314,1344,2947,2935,4213,4976,2767,2763,118,3390,1757])",
        "exclude_i = set([])",
    )
    src = src.replace("exclude_s = set(list(range(1928,2339)))", "exclude_s = set([])")
    exec(compile(src, "readbatch_10_patched.py", "exec"), {"__name__": "__main__"})

    from kmer_id_tpu.report.rollup import readbatch_10

    readbatch_10(str(rdir) + "/", str(refkey), str(tmp_path / "got.csv"), exclude=set())
    assert (tmp_path / "got.csv").read_bytes() == (tmp_path / "ref.csv").read_bytes()


def test_target_capture_bytes_match_reference(world):
    """vf6 ``-target N`` second capture file (kmer_read_vf6.cpp:612-620,
    1124-1128): all reads whose final target == N land in
    ``<job>_target_reads.txt``, and the main ``_reads.txt`` capture is
    disabled (still created empty)."""
    from kmer_id_tpu.config import ClassifyConfig
    from kmer_id_tpu.engine.pipeline import load_db, run_vf6

    root, wdir = world["root"], world["wdir"]
    read_bin = gh.classifier_vf6_binary()
    jdir2 = root / "jobs2"
    jdir2.mkdir(exist_ok=True)
    fa = root / "reads.fasta"
    fq = root / "reads.fastq.gz"
    (jdir2 / "jobs2.txt").write_text(f"tjob 2\n{fa}\n{fq}\n")

    r = gh.run(read_bin, ["-name", NAME, "-jname", "jobs2", "-target", "3"],
               cwd=str(root))
    assert r.returncode == 0, r.stdout + r.stderr
    ref = {}
    for f in ("tjob_result.txt", "tjob_reads.txt", "tjob_target_reads.txt"):
        ref[f] = (jdir2 / f).read_bytes()
        (jdir2 / f).unlink()
    assert len(ref["tjob_target_reads.txt"]) > 0  # target 3 reads captured
    assert ref["tjob_reads.txt"] == b""  # main capture gated off

    db = load_db(
        str(wdir / f"{NAME}_data.txt"),
        str(wdir / f"{NAME}_tree.txt"),
        str(wdir / f"{NAME}_probes.txt.gz"),
    )
    cfg = ClassifyConfig.preset("vf6", batch_size=16, max_len=128, save_target=3)
    run_vf6(NAME, "jobs2", db, cfg=cfg, root=str(root))
    for f in ("tjob_result.txt", "tjob_reads.txt", "tjob_target_reads.txt"):
        assert (jdir2 / f).read_bytes() == ref[f], f
