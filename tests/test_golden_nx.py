"""Golden parity for the nx batch driver vs compiled newkmer_10nx.

The nx binary hard-codes DB paths under ./bact10/ and scans argv[1] for
``*_R1_tr.fastq.gz`` samples (newkmer_10nx.cpp:29-30,67-70,992-1014), so the
fixture lays files out exactly that way; only MAXHASH is reduced for CI
memory.  Compared byte-for-byte: per-sample ``*_result.txt`` (5982 lines,
compile-time MAXTAR) and ``*_reads.txt`` capture files across two samples,
R1+R2 processed through shared counters.
"""

import gzip

import numpy as np
import pytest

from tests import golden_harness as gh
from tests.test_golden_reference import rand_dna, rng

NAME = "bact10"


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    build_bin = gh.build_binary()
    nx_bin = gh._compile(
        "newkmer_10nx.cpp",
        "ref_read_nx",
        [("const itype MAXHASH = (1 << 30);", "const itype MAXHASH = (1 << 22);")],
    )
    if not build_bin or not nx_bin:
        pytest.skip("reference sources or g++ unavailable")

    root = tmp_path_factory.mktemp("nxgold")
    fadir = root / "fa"
    fadir.mkdir()
    shared = rand_dna(300)
    genomes = {
        "nxA": rand_dna(600) + shared,
        "nxB": shared + rand_dna(600),
        "nxC": rand_dna(700),
    }
    ks = []
    from kmer_id_tpu.core import codec

    for g in genomes.values():
        ks.append(codec.canonical_kmers(codec.encode_bases(g))[0])
    gh.assert_no_builder_collisions(np.concatenate(ks))
    for acc, seq in genomes.items():
        with gzip.open(fadir / f"{acc}.fasta.gz", "wt") as f:
            f.write(f">{acc}\n{seq}\n")
    # build DB under ./tiny then install as ./bact10/{bData10,btree_10,probes10}
    wdir = root / "tinydb"
    wdir.mkdir()
    (wdir / "tinydb_data.txt").write_text("3\tnxA\n4\tnxB\n6\tnxC\n")
    (wdir / "tinydb_tree.txt").write_text("1\t2\n2\t3\n2\t4\n1\t5\n5\t6\n")
    (wdir / "tinydb_filter.txt").write_text("")
    r = gh.run(build_bin, ["-name", "tinydb", "-fadir", str(fadir) + "/"], cwd=str(root))
    assert r.returncode == 0, r.stdout + r.stderr
    dbdir = root / "bact10"
    dbdir.mkdir()
    (dbdir / "bData10.txt").write_bytes((wdir / "tinydb_data.txt").read_bytes())
    (dbdir / "btree_10.txt").write_bytes((wdir / "tinydb_tree.txt").read_bytes())
    gh.gzip_file(str(wdir / "tinydb_probes.txt"), str(dbdir / "probes10.txt.gz"))

    fqdir = root / "fastq"
    fqdir.mkdir()
    samples = {}
    for s in ("sampA", "sampB"):
        r1, r2 = [], []
        for i in range(25):
            src = list(genomes.values())[int(rng.integers(3))]
            pos = int(rng.integers(0, len(src) - 120))
            seq1 = src[pos : pos + 110]
            seq2 = src[pos + 5 : pos + 115]
            if rng.random() < 0.3:
                seq1 = rand_dna(110)
            q1 = "J" * 80 + "#" * 30 if i % 5 == 0 else "J" * 110
            r1.append((f"@{s}.{i}", seq1, q1))
            r2.append((f"@{s}.{i}b", seq2, "J" * 110))
        samples[s] = (r1, r2)
        for suffix, reads in (("_R1_tr.fastq.gz", r1), ("_R2_tr.fastq.gz", r2)):
            with gzip.open(fqdir / f"{s}{suffix}", "wt") as f:
                for acc, seq, q in reads:
                    f.write(f"{acc}\n{seq}\n+\n{q}\n")

    r = gh.run(nx_bin, [str(fqdir) + "/"], cwd=str(root))
    assert r.returncode == 0, r.stdout + r.stderr
    ref_out = {}
    for s in samples:
        ref_out[s] = {
            "result": (fqdir / f"{s}_result.txt").read_bytes(),
            "reads": (fqdir / f"{s}_reads.txt").read_bytes(),
        }
        (fqdir / f"{s}_result.txt").unlink()
        (fqdir / f"{s}_reads.txt").unlink()
    return dict(root=root, dbdir=dbdir, fqdir=fqdir, ref_out=ref_out)


def test_nx_driver_bytes_match_reference(world):
    from kmer_id_tpu.config import ClassifyConfig
    from kmer_id_tpu.engine.pipeline import load_db, run_nx

    db = load_db(
        str(world["dbdir"] / "bData10.txt"),
        str(world["dbdir"] / "btree_10.txt"),
        str(world["dbdir"] / "probes10.txt.gz"),
        num_targ=5982,
    )
    cfg = ClassifyConfig.preset("nx", batch_size=16, max_len=128)
    run_nx(str(world["fqdir"]), db, cfg)
    for s, out in world["ref_out"].items():
        got_result = (world["fqdir"] / f"{s}_result.txt").read_bytes()
        got_reads = (world["fqdir"] / f"{s}_reads.txt").read_bytes()
        assert got_result == out["result"], s
        assert got_reads == out["reads"], s
