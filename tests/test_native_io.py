"""Native C++ decode path vs the pure-Python reference path: identical output."""

import gzip
import io

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from kmer_id_tpu.config import ClassifyConfig  # noqa: E402
from kmer_id_tpu.core.taxonomy import Taxonomy  # noqa: E402
from kmer_id_tpu.engine.classify import Classifier  # noqa: E402
from kmer_id_tpu.engine.pipeline import SampleProcessor  # noqa: E402
from kmer_id_tpu.io.native_feed import native_available  # noqa: E402
from kmer_id_tpu.db.probes import pack_probes  # noqa: E402
from tests.test_classify_e2e import make_db, make_reads, rand_dna  # noqa: E402
from kmer_id_tpu.core import codec  # noqa: E402

rng = np.random.default_rng(55)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native fastx library unavailable"
)


@pytest.fixture(scope="module")
def world():
    rec, kmap = make_db(num_targ=8, probes_per_target=40)
    parent = [1, 1, 1, 2, 2, 4, 1, 6]
    tax = Taxonomy(np.array(parent, dtype=np.int32))
    packed = pack_probes(rec, num_targ=8)
    return kmap, tax, packed


def _write_files(tmp_path, kmap):
    records = make_reads(kmap, n=150, read_len=90, p_fastq=1.0)
    fq_gz = tmp_path / "reads.fastq.gz"
    with gzip.open(fq_gz, "wt") as f:
        for acc, seq, qual in records:
            f.write(f"{acc}\n{seq}\n+\n{qual}\n")
        f.write("\n\n")  # trailing blanks: phase must not advance
    fq = tmp_path / "reads.fastq"
    with open(fq, "w") as f:
        for acc, seq, qual in records:
            f.write(f"{acc} extra comment\n{seq}\n+ plus\n{qual}\r\n")
    fa_records = make_reads(kmap, n=80, read_len=120, p_fastq=0.0)
    # add long reads and short-dropped reads
    for i in range(4):
        parts = []
        for _ in range(4):
            parts.append(rand_dna(200))
            parts.append(codec.key_to_string(list(kmap)[i * 5]))
        fa_records.append((f"long{i}", "".join(parts), None))
    fa_records.append(("short", rand_dna(30), None))
    fa_gz = tmp_path / "reads.fasta.gz"
    with gzip.open(fa_gz, "wt") as f:
        for acc, seq, _ in fa_records:
            f.write(f">{acc}\n")
            for j in range(0, len(seq), 61):
                f.write(seq[j : j + 61] + "\n")
    fa = tmp_path / "reads.fasta"
    with open(fa, "w") as f:
        for acc, seq, _ in fa_records:
            f.write(f">{acc} description here\n")
            for j in range(0, len(seq), 57):
                f.write(seq[j : j + 57] + "\n")
            f.write("\n")  # blank line: stale-token duplication quirk
    return [fq_gz, fq, fa_gz, fa]


def test_native_matches_python_paths(world, tmp_path):
    kmap, tax, packed = world
    files = _write_files(tmp_path, kmap)
    cfg = ClassifyConfig.preset("vf6", num_targ=8, batch_size=32, max_len=128)
    clf = Classifier(packed, tax, batch_size=32, max_len=128)

    outs = {}
    for use_native in (False, True):
        saved = io.StringIO()
        sp = SampleProcessor(clf, cfg, reads_out=saved, use_native=use_native)
        for fl in files:
            sp.feed_file(str(fl))
        res = sp.finish()
        outs[use_native] = (res.gcount.tolist(), res.ucount.tolist(), res.reads,
                            saved.getvalue())
    assert outs[True] == outs[False]
    assert outs[True][2] > 200  # most records survived the gates
    assert len(outs[True][3]) > 0  # some reads captured


def test_native_batch_planes_match_python_batcher(world, tmp_path):
    """Row-level equality of the packed planes (codes/lengths/metas)."""
    from kmer_id_tpu.io.batch import ReadBatcher, Batch, LongRead
    from kmer_id_tpu.io.native_feed import NativePlaneFeeder
    from kmer_id_tpu.io import fastx

    kmap, tax, packed = world
    files = _write_files(tmp_path, kmap)
    B, L = 16, 128

    # python rows
    py_rows = []
    rb = ReadBatcher(B, L, u_is_t=True)
    def drain(items):
        for it in items:
            if isinstance(it, LongRead):
                py_rows.append((it.meta.acc, it.meta.trimmed_seq, None))
            else:
                for i in range(it.n_rows):
                    m = it.metas[i]
                    py_rows.append(
                        (m.acc, m.trimmed_seq, it.codes[i, : it.lengths[i]].copy())
                    )
    for fl in files:
        fmt = {"reads.fastq.gz": fastx.iter_fastq_gz, "reads.fastq": fastx.iter_fastq_plain,
               "reads.fasta.gz": fastx.iter_fasta_gz, "reads.fasta": fastx.iter_fasta_plain}
        it = fmt[fl.name](str(fl))
        for rec in it:
            drain(rb.add(*rec))
    drain(rb.flush())

    nat_rows = []
    feeder = NativePlaneFeeder(B, L, u_is_t=True)
    def drain_n(nbs):
        for nb in nbs:
            for i in range(nb.batch.n_rows):
                m = nb.batch.metas[i]
                if i in nb.long_rows:
                    nat_rows.append((m.acc, m.trimmed_seq, None))
                else:
                    nat_rows.append(
                        (m.acc, m.trimmed_seq,
                         nb.batch.codes[i, : nb.batch.lengths[i]].copy())
                    )
    for fl in files:
        drain_n(feeder.feed_path(str(fl)))
    drain_n(feeder.flush())

    assert len(py_rows) == len(nat_rows)
    for (pa, ps, pc), (na, ns, nc) in zip(py_rows, nat_rows):
        assert pa == na
        assert ps == ns
        if pc is None or nc is None:
            assert pc is None and nc is None
        else:
            assert (pc == nc).all()
