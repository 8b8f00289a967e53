import os

import numpy as np
import pytest

from kmer_id_tpu.db.build import build_probes
from kmer_id_tpu.db.entropy import check_entropy_keys
from kmer_id_tpu.core import codec
from tests.buildsim import BuildSim
from tests.oracles import check_entropy_ref

rng = np.random.default_rng(11)
BASES = np.array(list("ACGT"))


def rand_dna(n):
    return "".join(BASES[rng.integers(0, 4, size=n)])


def test_entropy_filter_matches_oracle():
    kmers = [rand_dna(30) for _ in range(300)]
    kmers += ["A" * 30, "AC" * 15, "ACG" * 10, "ACGT" * 7 + "AC",
              "A" * 12 + rand_dna(18), "A" * 11 + rand_dna(19),
              "AATT" * 7 + "AA", "AAAAACCCCCGGGGGTTTTT" + rand_dna(10)]
    keys = np.array([codec.string_to_key(s) for s in kmers], dtype=np.uint64)
    got = check_entropy_keys(keys)
    for s, g in zip(kmers, got):
        assert bool(g) == check_entropy_ref(s), s


def _write(path, text):
    with open(path, "w") as f:
        f.write(text)


@pytest.fixture
def tiny_world(tmp_path):
    """Synthetic genomes mirroring SURVEY.md §8's micro-dataset shape."""
    shared = rand_dna(300)  # shared by A1/A2 -> CA target 2
    outg = rand_dna(250)  # in A1 and the outgroup -> removed
    uA1, uA2, uB1 = rand_dna(400), rand_dna(400), rand_dna(400)
    genomes = {
        "accA1": uA1 + shared + outg,
        "accA2": shared + uA2,
        "accB1": uB1,
        "accOUT": rand_dna(150) + outg,
    }
    name = "tiny"
    wdir = tmp_path / name
    wdir.mkdir()
    fadir = tmp_path / "fa"
    fadir.mkdir()
    for acc, seq in genomes.items():
        import gzip

        with gzip.open(fadir / f"{acc}.fasta.gz", "wt") as f:
            f.write(f">{acc}\n")
            for i in range(0, len(seq), 70):
                f.write(seq[i : i + 70] + "\n")
    _write(wdir / f"{name}_data.txt", "3\taccA1\n4\taccA2\n6\taccB1\n")
    _write(wdir / f"{name}_tree.txt", "1\t2\n2\t3\n2\t4\n1\t5\n5\t6\n")
    _write(wdir / f"{name}_filter.txt", "accOUT\n")
    return tmp_path, name, genomes


def test_builder_matches_dict_oracle(tiny_world):
    tmp_path, name, genomes = tiny_world
    res = build_probes(name, str(tmp_path / "fa"), root=str(tmp_path))

    # oracle
    parent = [1] * 7
    parent[3] = 2
    parent[4] = 2
    parent[6] = 5
    ntargorgs = [0, 0, 0, 1, 1, 0, 1]
    sim = BuildSim(parent, ntargorgs)
    order = [("accA1", 3), ("accA2", 4), ("accB1", 6)]
    for acc, t in order:
        sim.pass1("N" + genomes[acc], t)  # leading contig separator
    sim.pass2("N" + genomes["accOUT"])
    for i, (acc, t) in enumerate(order):
        sim.pass3("N" + genomes[acc], i)

    got = [
        (
            codec.key_to_string(res.records.keys[i]),
            int(res.records.target[i]),
            int(res.records.org[i]),
            int(res.records.position[i]),
            "F" if res.records.fstrand[i] else "R",
            int(res.records.count[i]),
        )
        for i in range(len(res.records))
    ]
    assert got == sim.probes
    assert res.pcount.tolist() == sim.pcount
    assert len(got) > 0
    # shared block probes merged to CA target 2; outgroup block gone
    targets = {t for _, t, _, _, _, _ in got}
    assert 2 in targets and 3 in targets and 4 in targets and 6 in targets

    # emitted files parse back
    from kmer_id_tpu.db.probes import parse_probes_text

    rec = parse_probes_text(tmp_path / name / f"{name}_probes.txt")
    assert len(rec) == len(got)
    count_lines = open(tmp_path / name / f"{name}_count.txt").read().splitlines()
    assert count_lines[2].startswith("2,")


def test_builder_nonoverlap_spacing(tiny_world):
    tmp_path, name, genomes = tiny_world
    res = build_probes(name, str(tmp_path / "fa"), root=str(tmp_path))
    # within each org, emitted end positions are spaced > KSIZE apart
    for org in set(res.records.org.tolist()):
        pos = res.records.position[res.records.org == org]
        assert (np.diff(pos) > 30).all()
