"""Golden parity for the m3 single-sample driver vs compiled kmer_read_m3.

Note: m3's lookup bounds probing at MAXREPROBE=16 (`kmer_read_m3.cpp:42,232`)
and can false-miss keys whose insert probed deeper; kmer_id_tpu implements
exact-dictionary semantics (the nx/vf6 behavior).  At this fixture's load
factor (~2k keys in 2^22 slots) a 16-deep probe chain is essentially
impossible, so outputs must still match byte-for-byte.
"""

import gzip

import numpy as np
import pytest

from tests import golden_harness as gh
from tests.test_golden_reference import rand_dna

NAME = "mitochondria"


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    build_bin = gh.build_binary()
    m3_bin = gh.classifier_m3_binary()
    if not build_bin or not m3_bin:
        pytest.skip("reference sources or g++ unavailable")

    root = tmp_path_factory.mktemp("m3gold")
    wdir = root / NAME
    wdir.mkdir()
    fadir = root / "fa"
    fadir.mkdir()
    shared = rand_dna(280)
    genomes = {
        "mA": rand_dna(600) + shared,
        "mB": shared + rand_dna(600),
        "mC": rand_dna(700),
    }
    from kmer_id_tpu.core import codec

    ks = [codec.canonical_kmers(codec.encode_bases(g))[0] for g in genomes.values()]
    gh.assert_no_builder_collisions(np.concatenate(ks))
    for acc, seq in genomes.items():
        with gzip.open(fadir / f"{acc}.fasta.gz", "wt") as f:
            f.write(f">{acc}\n{seq}\n")
    (wdir / f"{NAME}_data.txt").write_text("3\tmA\n4\tmB\n5\tmC\n")
    (wdir / f"{NAME}_tree.txt").write_text("1\t2\n2\t3\n2\t4\n1\t5\n")
    (wdir / f"{NAME}_filter.txt").write_text("")
    r = gh.run(build_bin, ["-name", NAME, "-fadir", str(fadir) + "/"], cwd=str(root))
    assert r.returncode == 0, r.stdout + r.stderr
    gh.gzip_file(str(wdir / f"{NAME}_probes.txt"), str(wdir / f"{NAME}_probes.txt.gz"))

    # m3 expects DB files directly under wdir as mitochondria_{data,tree,probes}
    m3dir = root / "m3w"
    m3dir.mkdir()
    for suffix in ("data.txt", "tree.txt", "probes.txt.gz"):
        (m3dir / f"mitochondria_{suffix}").write_bytes(
            (wdir / f"{NAME}_{suffix}").read_bytes()
        )

    reads = [
        ("m1", genomes["mA"][10:160]),
        ("m2", genomes["mB"][-160:-10]),
        ("m3", shared[10:160]),
        ("m4", rand_dna(150)),
        ("m5", genomes["mC"][100:250]),
    ]
    f1 = root / "reads1.fastq.gz"
    with gzip.open(f1, "wt") as f:
        for acc, seq in reads[:3]:
            qual = "J" * (len(seq) - 30) + "#" * 30
            f.write(f"@{acc}\n{seq}\n+\n{qual}\n")
    f2 = root / "reads2.fasta"
    with open(f2, "w") as f:
        for acc, seq in reads[3:]:
            f.write(f">{acc} extra tokens\n{seq}\n")

    r = gh.run(
        m3_bin,
        ["-wdir", str(m3dir) + "/", "-f1", str(f1), "-f2", str(f2)],
        cwd=str(root),
    )
    assert r.returncode == 0, r.stdout + r.stderr
    ref_result = (m3dir / "result.txt").read_bytes()
    (m3dir / "result.txt").unlink()
    return dict(root=root, m3dir=m3dir, f1=f1, f2=f2, ref_result=ref_result)


def test_m3_driver_bytes_match_reference(world):
    from kmer_id_tpu.config import ClassifyConfig
    from kmer_id_tpu.engine.pipeline import run_m3

    cfg = ClassifyConfig.preset("m3", batch_size=16, max_len=192)
    run_m3(str(world["m3dir"]) + "/", str(world["f1"]), str(world["f2"]), cfg=cfg)
    got = (world["m3dir"] / "result.txt").read_bytes()
    assert got == world["ref_result"]
