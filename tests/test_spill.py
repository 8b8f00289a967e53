"""Disk-spilled builder (db/spill.py) parity vs the in-RAM builder.

Byte-identical probes.txt + count.txt on a multi-genome corpus with shared
blocks and an outgroup, across a forced multi-shard / tiny-batch spill
configuration (so shard merging, shard-sliced poisoning, the 3-phase pass-3
reorder, and the per-genome candidate respool all actually engage)."""

import gzip

import numpy as np
import pytest

from kmer_id_tpu.db.build import build_probes
from kmer_id_tpu.db.spill import build_probes_spill

rng = np.random.default_rng(41)
BASES = np.array(list("ACGT"))


def rand_dna(n):
    return "".join(BASES[rng.integers(0, 4, size=n)])


@pytest.fixture
def world(tmp_path):
    name = "sp"
    wdir = tmp_path / name
    wdir.mkdir()
    fadir = tmp_path / "fa"
    fadir.mkdir()
    shared = rand_dna(500)
    outg = rand_dna(400)
    data, tree = [], []
    for i in range(6):
        t = i + 2
        acc = f"org{i}"
        seq = rand_dna(4000) + shared + rand_dna(600)
        if i in (0, 3):
            seq += outg
        if i == 2:
            seq = seq[:1500] + "NN" + seq[1500:]
        with gzip.open(fadir / f"{acc}.fasta.gz", "wt") as f:
            f.write(f">{acc}\n")
            for j in range(0, len(seq), 70):
                f.write(seq[j : j + 70] + "\n")
        data.append(f"{t}\t{acc}")
        tree.append(f"1\t{t}" if i < 3 else f"2\t{t}")
    with gzip.open(fadir / "gOUT.fasta.gz", "wt") as f:
        f.write(">gOUT\n" + outg + "\n")
    (wdir / f"{name}_data.txt").write_text("\n".join(data) + "\n")
    (wdir / f"{name}_tree.txt").write_text("\n".join(tree) + "\n")
    (wdir / f"{name}_filter.txt").write_text("gOUT\n")
    return tmp_path, name


def test_spill_matches_in_ram_byte_identical(world):
    tmp_path, name = world
    fadir = str(tmp_path / "fa")
    res_ram = build_probes(name, fadir, root=str(tmp_path))
    p_ram = (tmp_path / name / f"{name}_probes.txt").read_bytes()
    c_ram = (tmp_path / name / f"{name}_count.txt").read_bytes()
    assert len(res_ram.records.keys) > 0

    # tiny batches force several shard merge rounds; 16 shards engage the
    # shard-sliced pass-2/3 paths
    res_sp = build_probes_spill(
        name, fadir, root=str(tmp_path), shard_bits=4,
        batch_bytes=1 << 18,
    )
    p_sp = (tmp_path / name / f"{name}_probes.txt").read_bytes()
    c_sp = (tmp_path / name / f"{name}_count.txt").read_bytes()
    assert p_sp == p_ram
    assert c_sp == c_ram
    assert res_sp.table_size == res_ram.table_size


def test_spill_matches_without_native(world, monkeypatch):
    from kmer_id_tpu.db import native as kn

    tmp_path, name = world
    fadir = str(tmp_path / "fa")
    build_probes(name, fadir, root=str(tmp_path))
    p_ram = (tmp_path / name / f"{name}_probes.txt").read_bytes()
    monkeypatch.setattr(kn, "_lib", None)
    monkeypatch.setattr(kn, "_lib_tried", True)
    build_probes_spill(
        name, fadir, root=str(tmp_path), shard_bits=3, batch_bytes=1 << 18
    )
    p_sp = (tmp_path / name / f"{name}_probes.txt").read_bytes()
    assert p_sp == p_ram
