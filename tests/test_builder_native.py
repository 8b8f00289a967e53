"""Native builder-kernel (db/native) parity vs the NumPy formulations.

The C++ kernels must produce byte/bit-identical arrays to the NumPy paths
they accelerate: genome decode + canonical extraction (core/codec +
io/fastx.load_genome_gz), sort/unique, entropy filter (db/entropy), the
pass-3 emission walk, and the full 3-pass builder output."""

import gzip
import os

import numpy as np
import pytest

from kmer_id_tpu.core import codec
from kmer_id_tpu.db import native as kn
from kmer_id_tpu.db.build import build_probes
from kmer_id_tpu.db.entropy import check_entropy_keys
from kmer_id_tpu.io.fastx import load_genome_gz

pytestmark = pytest.mark.skipif(
    not kn.native_available(), reason="native builder kernels unavailable"
)

rng = np.random.default_rng(23)
BASES = np.array(list("ACGT"))


def rand_dna(n):
    return "".join(BASES[rng.integers(0, 4, size=n)])


@pytest.fixture
def messy_genome(tmp_path):
    """A gz FASTA exercising every decode quirk: multiple contigs, lowercase,
    N runs, U bases, CRLF lines, empty lines, odd line widths."""
    seq1 = rand_dna(500).lower() + "NN" + rand_dna(300)
    seq2 = rand_dna(80) + "U" + rand_dna(200)
    path = tmp_path / "messy.fasta.gz"
    with gzip.open(path, "wt") as f:
        f.write(">contig1 desc\r\n")
        for i in range(0, len(seq1), 61):
            f.write(seq1[i : i + 61] + "\r\n")
        f.write("\n")
        f.write(">contig2\n")
        for i in range(0, len(seq2), 70):
            f.write(seq2[i : i + 70] + "\n")
    return str(path)


def test_unique_counts_matches_numpy(messy_genome):
    for u_is_t in (False, True):
        genome = load_genome_gz(messy_genome, u_is_t=u_is_t)
        enc = codec.encode_bases_u if u_is_t else codec.encode_bases
        keys, _, _ = codec.canonical_kmers(enc(genome))
        uk, counts = np.unique(keys, return_counts=True)
        got = kn.genome_unique_counts(messy_genome, "gz", u_is_t=u_is_t)
        assert got is not None
        np.testing.assert_array_equal(got[0], uk)
        np.testing.assert_array_equal(got[1], counts.astype(np.int32))


def test_unique_first_matches_numpy(messy_genome):
    genome = load_genome_gz(messy_genome)
    keys, gpos, fwd = codec.canonical_kmers(codec.encode_bases(genome))
    uk, first_idx = np.unique(keys, return_index=True)
    got = kn.genome_unique_first(messy_genome, "gz")
    assert got is not None
    np.testing.assert_array_equal(got[0], uk)
    np.testing.assert_array_equal(got[1], gpos[first_idx].astype(np.int32))
    np.testing.assert_array_equal(got[2], fwd[first_idx])


def test_contigs_kind_matches_numpy(tmp_path):
    from kmer_id_tpu.io.fastx import load_genome_contigs

    path = tmp_path / "x_contigs.fasta"
    with open(path, "w") as f:
        f.write(">c1\n")
        f.write(rand_dna(200) + "\n")
        f.write("A\n")  # single-char line: dropped entirely
        f.write("  " + rand_dna(50) + "  \n")  # whitespace stripped
        f.write(">c2\n" + rand_dna(100) + "\n")
    genome = load_genome_contigs(str(path))
    keys, _, _ = codec.canonical_kmers(codec.encode_bases(genome))
    uk, counts = np.unique(keys, return_counts=True)
    got = kn.genome_unique_counts(str(path), "contigs")
    np.testing.assert_array_equal(got[0], uk)
    np.testing.assert_array_equal(got[1], counts.astype(np.int32))


def test_entropy_native_bit_identical():
    kmers = [rand_dna(30) for _ in range(500)]
    kmers += ["A" * 30, "AC" * 15, "ACG" * 10, "ACGT" * 7 + "AC",
              "A" * 12 + rand_dna(18), "A" * 11 + rand_dna(19),
              "AATT" * 7 + "AA", "AAAAACCCCCGGGGGTTTTT" + rand_dna(10),
              "AACCGGTTAACCGGTTAACCGGTTAACCGG"]
    keys = np.array([codec.string_to_key(s) for s in kmers], dtype=np.uint64)
    want = check_entropy_keys(keys)
    got = kn.check_entropy_keys(keys)
    np.testing.assert_array_equal(got, want)


def test_sorts_match_numpy():
    a = rng.integers(0, 1 << 60, size=30_000).astype(np.uint64)
    a[100:200] = a[0]  # duplicates
    np.testing.assert_array_equal(
        kn.argsort_u64(a), np.argsort(a, kind="stable")
    )
    s = a.copy()
    kn.sort_u64(s)
    np.testing.assert_array_equal(s, np.sort(a))
    b = rng.integers(0, 1 << 31, size=30_000).astype(np.int32)
    np.testing.assert_array_equal(
        kn.argsort_i32(b), np.argsort(b, kind="stable")
    )


def test_keys_to_strings():
    keys = rng.integers(0, 1 << 60, size=200).astype(np.uint64)
    got = kn.keys_to_strings(keys)
    for k, s in zip(keys, got):
        assert s.decode() == codec.key_to_string(k)


def test_emit_walk_matches_python():
    n = 5000
    ctarg = rng.integers(2, 12, size=n).astype(np.int32)
    ctarg.sort()  # target runs, like real candidates
    pos = np.sort(rng.choice(200_000, size=n, replace=False)).astype(np.int64)
    nxt = np.searchsorted(pos, pos + 30, side="right")
    run_last = np.flatnonzero(np.concatenate([ctarg[1:] != ctarg[:-1], [True]]))
    run_next = np.repeat(
        run_last + 1, np.diff(np.concatenate([[0], run_last + 1]))
    )
    ent_known = rng.choice(
        np.array([-1, 0, 1], dtype=np.int8), size=n, p=[0.5, 0.1, 0.4]
    )
    for cap in (50, 100000):
        pc_py = np.zeros(20, dtype=np.int32)
        emit_py = []
        j = 0
        while j < n:
            t = ctarg[j]
            if pc_py[t] >= cap:
                j = int(run_next[j])
                continue
            if ent_known[j] != 0:
                emit_py.append(j)
                pc_py[t] += 1
                j = int(nxt[j])
                continue
            j += 1
        pc_c = np.zeros(20, dtype=np.int32)
        got = kn.emit_walk(ctarg, nxt, run_next, ent_known, pc_c, cap)
        np.testing.assert_array_equal(got, np.asarray(emit_py, dtype=np.int64))
        np.testing.assert_array_equal(pc_c, pc_py)


@pytest.fixture
def small_world(tmp_path):
    """Multi-org corpus with shared blocks, an outgroup, and N runs."""
    name = "nat"
    wdir = tmp_path / name
    wdir.mkdir()
    fadir = tmp_path / "fa"
    fadir.mkdir()
    shared = rand_dna(400)
    outg = rand_dna(300)
    data, tree = [], []
    for i in range(5):
        t = i + 2
        acc = f"org{i}"
        seq = rand_dna(3000) + shared + rand_dna(500)
        if i == 0:
            seq += outg
        if i == 2:
            seq = seq[:1000] + "NNN" + seq[1000:]
        with gzip.open(fadir / f"{acc}.fasta.gz", "wt") as f:
            f.write(f">{acc}\n")
            for j in range(0, len(seq), 70):
                f.write(seq[j : j + 70] + "\n")
        data.append(f"{t}\t{acc}")
        tree.append(f"1\t{t}")
    with gzip.open(fadir / "gOUT.fasta.gz", "wt") as f:
        f.write(">gOUT\n" + outg + "\n")
    (wdir / f"{name}_data.txt").write_text("\n".join(data) + "\n")
    (wdir / f"{name}_tree.txt").write_text("\n".join(tree) + "\n")
    (wdir / f"{name}_filter.txt").write_text("gOUT\n")
    return tmp_path, name


def test_full_build_native_vs_numpy_byte_identical(small_world):
    tmp_path, name = small_world
    fadir = str(tmp_path / "fa")
    res_n = build_probes(name, fadir, root=str(tmp_path), native=True)
    p_native = (tmp_path / name / f"{name}_probes.txt").read_bytes()
    c_native = (tmp_path / name / f"{name}_count.txt").read_bytes()
    res_p = build_probes(name, fadir, root=str(tmp_path), native=False)
    p_numpy = (tmp_path / name / f"{name}_probes.txt").read_bytes()
    c_numpy = (tmp_path / name / f"{name}_count.txt").read_bytes()
    assert len(res_n.records.keys) > 0
    assert p_native == p_numpy
    assert c_native == c_numpy
