"""Smith-Waterman verification path (core/align.py + engine/verify.py).

Three layers of coverage for the reference's optional alignment gate
(``newkmer_10nx.cpp:365-450,530-587``; disabled in all shipped configs via
``minalign = 0`` but fully implemented):

1. ``banded_align_score`` vs a brute-force cell-by-cell oracle of the same
   clean-boundary banded affine-gap recurrence (the reference's own DP table
   is neither cleared between calls nor initialized inside the band's
   top-right edge, so its exact values are memory-state-dependent — the
   *intended* recurrence is the testable contract).
2. Closed-form score identities (all-match, one mismatch, one gap).
3. End-to-end ``minalign > 0`` runs over a synthetic genome world:
   genuine reads (forward, reverse, and quality-trimmed) pass the gate and
   reproduce the ungated counts; chimeric reads (a probe 30-mer planted in
   foreign sequence) are rejected; the live ``gcount < minalign`` trigger
   stops gating once a target is established.
"""

import gzip

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from kmer_id_tpu.config import ClassifyConfig  # noqa: E402
from kmer_id_tpu.core import codec  # noqa: E402
from kmer_id_tpu.core.align import (  # noqa: E402
    BEAM,
    GAPO,
    GAPX,
    MATCH,
    MISMATCH,
    NINF,
    banded_align_score,
)
from kmer_id_tpu.core.taxonomy import Taxonomy  # noqa: E402
from kmer_id_tpu.db.probes import ProbeRecords, pack_probes  # noqa: E402
from kmer_id_tpu.engine.pipeline import SampleProcessor, make_classifier  # noqa: E402
from kmer_id_tpu.engine.verify import GenomeCache, revcomp_text  # noqa: E402

rng = np.random.default_rng(29)
BASES = "ACGT"


def rand_dna(n: int) -> str:
    return "".join(BASES[i] for i in rng.integers(0, 4, size=n))


# ------------------------------------------------------------------ oracle


def oracle_banded(dna1: str, dna2: str, beam: int = BEAM) -> int:
    """Cell-by-cell direct evaluation of the banded affine recurrence with
    clean boundaries (free end gaps), matching core/align.py's contract."""
    n1, n2 = len(dna1), len(dna2)
    if n1 == 0 or n2 == 0:
        return 0
    M = [[NINF] * (n1 + 1) for _ in range(n2 + 1)]
    I = [[NINF] * (n1 + 1) for _ in range(n2 + 1)]
    D = [[NINF] * (n1 + 1) for _ in range(n2 + 1)]
    for i in range(n1 + 1):
        M[0][i] = 0  # free leading gap in dna1
    for j in range(1, n2 + 1):
        if j <= beam:
            M[j][0] = 0  # free leading gap in dna2
            I[j][0] = 0
        lo, hi = max(1, j - beam), min(n1, j + beam)
        for i in range(lo, hi + 1):  # all three matrices confined to the band
            sub = MATCH if dna1[i - 1] == dna2[j - 1] else MISMATCH
            M[j][i] = max(M[j - 1][i - 1], I[j - 1][i - 1], D[j - 1][i - 1]) + sub
            I[j][i] = max(M[j - 1][i] - GAPO, I[j - 1][i] - GAPX)
            D[j][i] = max(M[j][i - 1] - GAPO, D[j][i - 1] - GAPX)
    return max(M[n2][n1], I[n2][n1], D[n2][n1])


def test_align_matches_oracle_random():
    for _ in range(25):
        n = int(rng.integers(5, 90))
        a = rand_dna(n)
        # derive b from a with band-respecting point edits
        b = list(a)
        for _ in range(int(rng.integers(0, 5))):
            b[int(rng.integers(len(b)))] = BASES[int(rng.integers(4))]
        if rng.random() < 0.4 and len(b) > 10:  # one indel (stays in band)
            p = int(rng.integers(1, len(b) - 1))
            if rng.random() < 0.5:
                del b[p]
            else:
                b.insert(p, BASES[int(rng.integers(4))])
        b = "".join(b)
        assert _norm(banded_align_score(a, b)) == _norm(oracle_banded(a, b))
        assert _norm(banded_align_score(b, a)) == _norm(oracle_banded(b, a))
    # fully random pairs too (low scores, exercises NINF plumbing)
    for _ in range(10):
        n = int(rng.integers(3, 60))
        a = rand_dna(n)
        b = rand_dna(max(1, n + int(rng.integers(-BEAM, BEAM + 1))))
        assert _norm(banded_align_score(a, b)) == _norm(oracle_banded(a, b))


def _norm(score: int) -> int:
    """Scores derived from unreachable (NINF) cells differ in exact garbage
    magnitude between implementations; both mean 'reject'."""
    return score if score > -(10**6) else NINF


def test_align_corner_outside_band_rejects():
    """|len1 - len2| > beam puts the final cell outside the band: the read
    cannot be fully aligned and the score must be deeply negative."""
    a = rand_dna(80)
    assert banded_align_score(a, a[: 80 - BEAM - 5]) < -(10**6)
    assert banded_align_score(a[: 80 - BEAM - 5], a) < -(10**6)


def test_align_closed_forms():
    s = rand_dna(80)
    assert banded_align_score(s, s) == MATCH * len(s)
    one_mm = s[:40] + ("A" if s[40] != "A" else "C") + s[41:]
    assert banded_align_score(s, one_mm) == MATCH * (len(s) - 1) + MISMATCH
    # one internal deletion: affine open, free end gaps don't apply inside
    deleted = s[:40] + s[41:]
    assert banded_align_score(deleted, s) == MATCH * (len(s) - 1) - GAPO
    # leading gaps are free (zero-init row/col, as the reference's
    # INIGAPPEN=0 tableinit); trailing gaps are charged at the corner read
    assert banded_align_score(s, rand_dna(BEAM - 1) + s) == MATCH * len(s)
    assert (
        banded_align_score(s, s + "A" * (BEAM - 1))
        == MATCH * len(s) - GAPO - (BEAM - 2) * GAPX
    )
    assert banded_align_score("", s) == 0


# ------------------------------------------------------------ e2e world


@pytest.fixture(scope="module")
def verify_world(tmp_path_factory):
    """A genome on disk + probes drawn from it with true positions/strands."""
    fadir = tmp_path_factory.mktemp("fadir")
    glen = 700
    gseq = rand_dna(glen)
    with gzip.open(fadir / "accA.fasta.gz", "wt") as f:
        f.write(">contig1\n")
        for s in range(0, glen, 80):
            f.write(gseq[s : s + 80] + "\n")
    genome = "N" + gseq  # the loader's per-header N join (newkmer_10nx.cpp:341)

    # probes: 30-mers ending every 37 bases; position = last-base index in
    # the N-joined genome (builder emit semantics, kmer_build_vf6.cpp:625)
    keys, poss, fstr = [], [], []
    for last in range(codec.KSIZE, glen, 37):
        kmer = gseq[last - codec.KSIZE + 1 : last + 1]
        fwd, _ = codec.forward_kmers(codec.encode_bases(kmer))
        fkey = int(fwd[0])
        ckey = min(fkey, codec.revcomp_key(fkey))
        keys.append(ckey)
        poss.append(1 + last)  # +1 for the leading N
        fstr.append(ckey == fkey)
    n = len(keys)
    records = ProbeRecords(
        keys=np.array(keys, dtype=np.uint64),
        target=np.full(n, 3, np.int32),
        org=np.zeros(n, np.int32),
        position=np.array(poss, np.int32),
        fstrand=np.array(fstr, bool),
        count=np.ones(n, np.int32),
    )
    packed = pack_probes(records, num_targ=8)
    tax = Taxonomy.from_edges([(1, 2), (2, 3)], num_nodes=8)
    return str(fadir), gseq, packed, tax


def _genome_cfg(fadir, minalign, **kw):
    return ClassifyConfig.preset(
        "vf6", num_targ=8, batch_size=16, max_len=192,
        minalign=minalign, fadir=fadir, accessions=["accA"], **kw,
    )


class _FakeDB:
    def __init__(self, packed, tax):
        self.packed = packed
        self.taxonomy = tax
        self.num_targ = 8
        self.kmers_loaded = len(packed)
        self.strains = None


def _run(records, fadir, packed, tax, minalign):
    cfg = _genome_cfg(fadir, minalign)
    clf = make_classifier(_FakeDB(packed, tax), cfg)
    sp = SampleProcessor(clf, cfg)
    sp.feed(records)
    return sp.finish()


def test_genuine_reads_pass_gate(verify_world):
    """Reads sliced from the genome verify on both strands; gated counts
    equal ungated counts."""
    fadir, gseq, packed, tax = verify_world
    records = []
    for i in range(12):
        s = int(rng.integers(0, len(gseq) - 150))
        seq = gseq[s : s + 150]
        if i % 3 == 2:
            seq = revcomp_text(seq)  # reverse-strand read
        records.append((f"g{i}", seq, "J" * 150))
    base = _run(records, fadir, packed, tax, minalign=0)
    gated = _run(records, fadir, packed, tax, minalign=100)
    assert base.gcount[3] > 0  # probes actually hit
    assert gated.gcount.tolist() == base.gcount.tolist()
    assert gated.ucount.tolist() == base.ucount.tolist()


def test_trimmed_genuine_reads_pass_gate(verify_world):
    """Quality-trimmed leading bases exercise the reference's full-sequence
    coordinate quirk (newkmer_10nx.cpp:532,543): the genome window is derived
    from the UNtrimmed k-mer index ``it1`` while dna1 is the trimmed read, so
    the window is shifted left by trim_start.  Within the beam (<= 8) the
    banded DP absorbs the shift via its free leading gap and genuine reads
    still pass; beyond the beam the gate rejects — reference-exact either
    way (its production inputs are pre-trimmed ``_tr`` files)."""
    fadir, gseq, packed, tax = verify_world
    small, big = [], []
    for i in range(8):
        s = int(rng.integers(0, len(gseq) - 160))
        small.append((f"s{i}", rand_dna(5) + gseq[s : s + 150], "#" * 5 + "J" * 150))
        big.append((f"b{i}", rand_dna(20) + gseq[s : s + 150], "#" * 20 + "J" * 150))
    base = _run(small, fadir, packed, tax, minalign=0)
    gated = _run(small, fadir, packed, tax, minalign=100)
    assert base.gcount[3] > 0
    assert gated.gcount.tolist() == base.gcount.tolist()
    assert gated.ucount.tolist() == base.ucount.tolist()
    # shift 20 > beam 8: the reference would reject these too
    gated_big = _run(big, fadir, packed, tax, minalign=100)
    assert gated_big.gcount[3] == 0 and gated_big.gcount[0] == 8


def test_chimeric_reads_rejected(verify_world):
    """A probe 30-mer planted in foreign sequence hits the DB but fails the
    alignment (30 matching bases of 150 scores far below 5*150/2)."""
    fadir, gseq, packed, tax = verify_world
    kstr = codec.key_to_string(int(packed.keys[0]))
    records = []
    for i in range(5):
        seq = rand_dna(60) + kstr + rand_dna(60)
        records.append((f"c{i}", seq, "J" * 150))
    base = _run(records, fadir, packed, tax, minalign=0)
    gated = _run(records, fadir, packed, tax, minalign=100)
    assert base.gcount[3] == 5  # ungated: all classified to the probe target
    assert gated.gcount[3] == 0  # gated: every hit rejected
    assert gated.gcount[0] == 5
    assert gated.ucount[3] == 0  # voided hits don't count unique k-mers


def test_gate_stops_after_minalign(verify_world):
    """Once gcount[target] reaches minalign, later reads skip alignment
    (the reference's live-trigger, newkmer_10nx.cpp:530) — a chimeric read
    fed after enough genuine ones is accepted."""
    fadir, gseq, packed, tax = verify_world
    genuine = [
        (f"g{i}", gseq[37 * i : 37 * i + 150], "J" * 150) for i in range(3)
    ]
    kstr = codec.key_to_string(int(packed.keys[0]))
    chimera = [("c0", rand_dna(60) + kstr + rand_dna(60), "J" * 150)]
    res = _run(genuine + chimera, fadir, packed, tax, minalign=2)
    # 3 genuine reads pass; by the chimera, gcount[3] >= 2 => no gate => hit
    assert res.gcount[3] == 4
    res2 = _run(chimera + genuine, fadir, packed, tax, minalign=2)
    # chimera first: gated and rejected
    assert res2.gcount[3] == 3 and res2.gcount[0] == 1


def test_genome_cache(verify_world):
    fadir, gseq, packed, tax = verify_world
    gc = GenomeCache(fadir, ["accA", "missing"])
    g = gc.get(0)
    assert g == "N" + gseq
    assert gc.get(0) is g  # cached
    assert gc.get(1) == ""  # absent genome -> empty, no crash
