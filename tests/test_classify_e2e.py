"""End-to-end engine equivalence vs the pure-Python reference simulator."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from kmer_id_tpu.config import ClassifyConfig  # noqa: E402
from kmer_id_tpu.core import codec  # noqa: E402
from kmer_id_tpu.core.taxonomy import Taxonomy  # noqa: E402
from kmer_id_tpu.db.probes import ProbeRecords, pack_probes  # noqa: E402
from kmer_id_tpu.engine.classify import Classifier  # noqa: E402
from kmer_id_tpu.engine.pipeline import SampleProcessor  # noqa: E402
from tests.refsim import RefSim  # noqa: E402

rng = np.random.default_rng(7)
BASES = np.array(list("ACGT"))


def rand_dna(n):
    return "".join(BASES[rng.integers(0, 4, size=n)])


def make_db(num_targ=8, probes_per_target=30):
    """Random unique canonical keys assigned to targets 2..num_targ-1."""
    kmers = {}
    while len(kmers) < (num_targ - 2) * probes_per_target:
        s = rand_dna(30)
        key, _, _ = codec.canonical_kmers(codec.encode_bases(s))
        if len(key) and int(key[0]) not in kmers:
            t = 2 + len(kmers) % (num_targ - 2)
            kmers[int(key[0])] = (t, codec.key_to_string(int(key[0])))
    keys = np.array(sorted(kmers), dtype=np.uint64)
    targets = np.array([kmers[int(k)][0] for k in keys], dtype=np.int32)
    rec = ProbeRecords(
        keys=keys,
        target=targets,
        org=np.zeros(len(keys), np.int32),
        position=np.zeros(len(keys), np.int32),
        fstrand=np.ones(len(keys), bool),
        count=np.ones(len(keys), np.int32),
    )
    return rec, {int(k): int(t) for k, t in zip(keys, targets)}


def probe_seq(kmap, target, taxonomy_ok=True):
    """A 30-mer string whose canonical key maps to `target`."""
    for k, t in kmap.items():
        if t == target:
            return codec.key_to_string(k)
    raise KeyError(target)


def make_reads(kmap, n=200, read_len=90, p_fastq=0.7):
    """Reads embedding DB 30-mers (forward or revcomp) in random context."""
    records = []
    keys = list(kmap)
    for i in range(n):
        roll = rng.random()
        if roll < 0.75:
            k = keys[int(rng.integers(len(keys)))]
            ins = codec.key_to_string(k)
            if rng.random() < 0.5:
                ins = codec.key_to_string(codec.revcomp_key(k))
            pad = read_len - 30
            left = int(rng.integers(0, pad + 1))
            seq = rand_dna(left) + ins + rand_dna(pad - left)
        else:
            seq = rand_dna(read_len)
        if rng.random() < 0.02:
            pos = int(rng.integers(0, len(seq)))
            seq = seq[:pos] + "N" + seq[pos + 1 :]
        if rng.random() < p_fastq:
            qual = "".join(
                chr(int(c)) for c in rng.integers(33, 74, size=len(seq))
            )
            records.append((f"@r{i}", seq, qual))
        else:
            records.append((f"r{i}", seq, None))
    return records


@pytest.fixture(scope="module")
def world():
    rec, kmap = make_db()
    parent = [1] * 8
    parent[3] = 2
    parent[4] = 2
    parent[5] = 4
    parent[6] = 1
    parent[7] = 6
    tax = Taxonomy(np.array(parent, dtype=np.int32))
    packed = pack_probes(rec, num_targ=8)
    return rec, kmap, parent, tax, packed


@pytest.mark.parametrize("batch_size,max_len", [(16, 96), (64, 64)])
def test_engine_matches_refsim(world, batch_size, max_len):
    rec, kmap, parent, tax, packed = world
    records = make_reads(kmap, n=300, read_len=90)

    sim = RefSim(kmap, parent, num_targ=8, u_is_t=False)
    sim_finals = sim.feed(records)

    cfg = ClassifyConfig.preset("nx", num_targ=8, batch_size=batch_size, max_len=max_len)
    clf = Classifier(packed, tax, batch_size=batch_size, max_len=max_len)
    sp = SampleProcessor(clf, cfg)
    sp.feed(records)
    res = sp.finish()

    assert res.reads == sim.reads
    assert res.gcount.tolist() == sim.gcount
    assert res.ucount.tolist() == sim.ucount


def test_long_reads_and_chunking(world):
    rec, kmap, parent, tax, packed = world
    # long FASTA "contigs" exceeding max_len, with embedded probes and Ns
    records = []
    for i in range(6):
        parts = []
        for _ in range(8):
            parts.append(rand_dna(int(rng.integers(50, 300))))
            k = list(kmap)[int(rng.integers(len(kmap)))]
            parts.append(codec.key_to_string(k))
            if rng.random() < 0.3:
                parts.append("N")
        records.append((f"c{i}", "".join(parts), None))
    sim = RefSim(kmap, parent, num_targ=8, u_is_t=False)
    sim.feed(records)

    cfg = ClassifyConfig.preset("nx", num_targ=8, batch_size=8, max_len=128)
    clf = Classifier(packed, tax, batch_size=8, max_len=128)
    sp = SampleProcessor(clf, cfg)
    sp.feed(records)
    res = sp.finish()
    assert res.gcount.tolist() == sim.gcount
    assert res.ucount.tolist() == sim.ucount


def test_saved_reads_order(world):
    rec, kmap, parent, tax, packed = world
    records = make_reads(kmap, n=400, read_len=70, p_fastq=1.0)
    sim = RefSim(kmap, parent, num_targ=8, u_is_t=False, savenum=12, variant="nx")
    sim.feed(records)

    import io

    out = io.StringIO()
    cfg = ClassifyConfig.preset("nx", num_targ=8, batch_size=32, max_len=96)
    clf = Classifier(packed, tax, batch_size=32, max_len=96)
    sp = SampleProcessor(clf, cfg, reads_out=out)
    sp.feed(records)
    sp.finish()

    expected = "".join(f">{t}:{a}\n{s}\n" for t, a, s in sim.saved)
    assert out.getvalue() == expected
