import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from kmer_id_tpu.core import codec  # noqa: E402
from kmer_id_tpu.core.taxonomy import Taxonomy  # noqa: E402
from kmer_id_tpu.ops.extract import extract_kmers  # noqa: E402
from kmer_id_tpu.ops.fold import fold_targets, lca_jnp, msca_jnp  # noqa: E402
from kmer_id_tpu.ops.lookup import lookup_keys  # noqa: E402
from tests.oracles import ca_ref, fold_ref, msca_ref, rolling_kmers  # noqa: E402

rng = np.random.default_rng(3)


def random_seq(n, p_bad=0.0):
    chars = np.array(list("ACGTN"))
    p = [(1 - p_bad) / 4] * 4 + [p_bad]
    return "".join(rng.choice(chars, p=p) for _ in range(n))


def test_extract_matches_oracle():
    L = 80
    seqs = [random_seq(int(rng.integers(10, L)), p_bad=0.05) for _ in range(17)]
    B = len(seqs)
    codes = np.full((B, L), 4, dtype=np.uint8)
    lengths = np.zeros(B, dtype=np.int32)
    for i, s in enumerate(seqs):
        c = codec.encode_bases(s)
        codes[i, : len(c)] = c
        lengths[i] = len(c)
    ex = extract_kmers(jnp.asarray(codes), jnp.asarray(lengths))
    hi, lo = np.asarray(ex["hi"]), np.asarray(ex["lo"])
    valid = np.asarray(ex["valid"])
    fstr = np.asarray(ex["fstrand"])
    for i, s in enumerate(seqs):
        oracle = {end: (kf, kr, key) for end, kf, kr, key in rolling_kmers(s)}
        for p in range(L - 30 + 1):
            end = p + 29
            if end in oracle:
                kf, kr, key = oracle[end]
                assert valid[i, p]
                got = (int(hi[i, p]) << 32) | int(lo[i, p])
                assert got == key, (i, p, s)
                assert bool(fstr[i, p]) == (kf < kr)
            else:
                assert not valid[i, p]


def _packed_dict(keys_sorted):
    hi, lo = codec.split_key(keys_sorted)
    return {"hi": jnp.asarray(hi), "lo": jnp.asarray(lo)}


@pytest.mark.parametrize("n", [1, 5, 1000])
def test_lookup_present_and_absent(n):
    keys = np.unique(rng.integers(0, 1 << 60, size=n, dtype=np.uint64))
    db = _packed_dict(keys)
    # queries: all present keys + some absent
    absent = rng.integers(0, 1 << 60, size=50, dtype=np.uint64)
    absent = absent[~np.isin(absent, keys)]
    q = np.concatenate([keys, absent])
    qhi, qlo = codec.split_key(q)
    idx, found = lookup_keys(db, jnp.asarray(qhi), jnp.asarray(qlo))
    idx, found = np.asarray(idx), np.asarray(found)
    assert found[: len(keys)].all()
    assert (idx[: len(keys)] == np.arange(len(keys))).all()
    assert not found[len(keys) :].any()
    assert (idx[len(keys) :] == len(keys)).all()


def test_lookup_with_buckets():
    keys = np.unique(rng.integers(0, 1 << 60, size=5000, dtype=np.uint64))
    hi, lo = codec.split_key(keys)
    bb = 7
    bucket = (hi >> np.uint32(28 - bb)).astype(np.int64)
    off = np.zeros((1 << bb) + 1, dtype=np.int32)
    np.cumsum(np.bincount(bucket, minlength=1 << bb), out=off[1:])
    db = {"hi": jnp.asarray(hi), "lo": jnp.asarray(lo), "bucket_off": jnp.asarray(off)}
    q = np.concatenate([keys[::7], rng.integers(0, 1 << 60, size=100, dtype=np.uint64)])
    qhi, qlo = codec.split_key(q)
    idx, found = lookup_keys(db, jnp.asarray(qhi), jnp.asarray(qlo), bucket_bits=bb)
    exp_idx = np.searchsorted(keys, q)
    exp_found = (exp_idx < len(keys)) & (keys[np.minimum(exp_idx, len(keys) - 1)] == q)
    assert (np.asarray(found) == exp_found).all()
    assert (np.asarray(idx)[exp_found] == exp_idx[exp_found]).all()


def test_msca_lca_jnp_match_walks():
    parent = [1] * 30
    for i in range(2, 30):
        parent[i] = int(rng.integers(1, i))
    tax = Taxonomy(np.array(parent))
    anc, depth = jnp.asarray(tax.anc), jnp.asarray(tax.depth)
    xs, ys = np.meshgrid(np.arange(1, 30), np.arange(1, 30))
    xs, ys = xs.ravel().astype(np.int32), ys.ravel().astype(np.int32)
    got_m = np.asarray(msca_jnp(anc, depth, jnp.asarray(xs), jnp.asarray(ys)))
    got_l = np.asarray(lca_jnp(anc, depth, jnp.asarray(xs), jnp.asarray(ys)))
    for x, y, gm, gl in zip(xs, ys, got_m, got_l):
        assert gm == msca_ref(parent, int(x), int(y))
        assert gl == ca_ref(parent, int(x), int(y))


def test_fold_targets_ordered_exactness():
    parent = [1, 1, 1, 2, 2, 3]  # 3,4 under 2; 5 under 3
    tax = Taxonomy(np.array(parent))
    anc, depth = jnp.asarray(tax.anc), jnp.asarray(tax.depth)
    seqs = [
        [3, 4, 5],  # order-dependent case -> 5
        [3, 5, 4],  # -> 2
        [0, 0, 0],
        [4, 0, 0],
        [5, 3, 2],
        [2, 3, 5],
    ]
    t = np.array(seqs, dtype=np.int32)
    got = np.asarray(fold_targets(anc, depth, jnp.asarray(t)))
    for row, g in zip(seqs, got):
        assert g == fold_ref(parent, row), row


def test_fold_with_carry():
    parent = [1, 1, 1, 2, 2]
    tax = Taxonomy(np.array(parent))
    anc, depth = jnp.asarray(tax.anc), jnp.asarray(tax.depth)
    t = np.array([[4, 0]], dtype=np.int32)
    init = np.array([3], dtype=np.int32)
    got = np.asarray(fold_targets(anc, depth, jnp.asarray(t), jnp.asarray(init)))
    assert got[0] == fold_ref(parent, [3, 4])
