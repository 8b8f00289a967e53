import numpy as np
import pytest

from kmer_id_tpu.core import codec
from tests.oracles import rolling_kmers

rng = np.random.default_rng(0)


def random_seq(n, alphabet="ACGT", p_bad=0.0):
    chars = list(alphabet) + (["N"] if p_bad > 0 else [])
    probs = None
    if p_bad > 0:
        probs = [(1 - p_bad) / len(alphabet)] * len(alphabet) + [p_bad]
    return "".join(rng.choice(chars, p=probs) for _ in range(n))


def test_key_string_roundtrip():
    for _ in range(50):
        s = random_seq(30)
        k = codec.string_to_key(s)
        assert codec.key_to_string(k) == s
        assert 0 <= k < (1 << 60)


def test_revcomp_involution():
    for _ in range(20):
        s = random_seq(30)
        k = codec.string_to_key(s)
        assert codec.revcomp_key(codec.revcomp_key(k)) == k


def test_canonical_matches_rolling_oracle():
    for trial in range(30):
        n = int(rng.integers(5, 200))
        s = random_seq(n, p_bad=0.1 if trial % 2 else 0.0)
        codes = codec.encode_bases(s)
        keys, pos, fwd = codec.canonical_kmers(codes)
        oracle = rolling_kmers(s)
        assert len(keys) == len(oracle)
        for (i, kf, kr, k), kk, pp, ff in zip(oracle, keys, pos, fwd):
            assert pp == i
            assert int(kk) == k
            assert bool(ff) == (kf < kr)


def test_forward_kmers_match_oracle_forward():
    s = random_seq(100)
    keys, pos = codec.forward_kmers(codec.encode_bases(s))
    oracle = rolling_kmers(s)
    assert [int(k) for k in keys] == [kf for (_, kf, _, _) in oracle]


def test_split_join_key():
    keys = rng.integers(0, 1 << 60, size=100, dtype=np.uint64)
    hi, lo = codec.split_key(keys)
    assert (codec.join_key(hi, lo) == keys).all()
    # ordering is preserved lexicographically on (hi, lo)
    a, b = np.sort(keys)[:2]
    ah, al = codec.split_key(np.array([a]))
    bh, bl = codec.split_key(np.array([b]))
    assert (ah[0], al[0]) <= (bh[0], bl[0])


def test_u_maps_to_t_only_in_u_lut():
    s = "ACGU" * 10
    codes_nx = codec.encode_bases(s)
    codes_u = codec.encode_bases_u(s)
    assert (codes_nx == 4).sum() == 10  # U invalid for nx
    assert (codes_u == 4).sum() == 0
    k_u, _, _ = codec.canonical_kmers(codes_u)
    k_t, _, _ = codec.canonical_kmers(codec.encode_bases("ACGT" * 10))
    assert (k_u == k_t).all()
