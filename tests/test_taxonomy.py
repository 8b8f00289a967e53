import numpy as np
import pytest

from kmer_id_tpu.core.taxonomy import Taxonomy
from tests.oracles import ca_ref, fold_ref, msca_ref

rng = np.random.default_rng(1)


def random_tree(n):
    """Random parent array: node i's parent < i (plus some unlisted nodes)."""
    parent = [1] * n
    for i in range(2, n):
        if rng.random() < 0.15:
            continue  # unlisted node: parent stays root (reference default)
        parent[i] = int(rng.integers(1, i))
    return parent


@pytest.mark.parametrize("n", [3, 8, 40])
def test_msca_and_lca_match_reference_walks(n):
    parent = random_tree(n)
    tax = Taxonomy(np.array(parent))
    xs, ys = np.meshgrid(np.arange(1, n), np.arange(1, n))
    xs, ys = xs.ravel(), ys.ravel()
    got_msca = tax.msca(xs, ys)
    got_lca = tax.lca(xs, ys)
    for x, y, gm, gl in zip(xs, ys, got_msca, got_lca):
        assert gm == msca_ref(parent, int(x), int(y)), (x, y, parent)
        assert gl == ca_ref(parent, int(x), int(y)), (x, y, parent)


def test_fold_order_dependence_modeled():
    # a ⊥ b under G=2, c below a: fold(a,b,c)=c but fold(a,c,b)=a.
    # Edges: 2->3 (a), 2->4 (b), 3->5 (c)
    tax = Taxonomy.from_edges([(1, 2), (2, 3), (2, 4), (3, 5)])
    parent = list(tax.parent)
    assert fold_ref(parent, [3, 4, 5]) == 5
    assert fold_ref(parent, [3, 5, 4]) == 2
    # the vectorized msca agrees pairwise
    assert tax.msca(3, 4) == 2
    assert tax.msca(5, 2) == 5
    assert tax.msca(2, 5) == 5


def test_depths_and_from_edges():
    tax = Taxonomy.from_edges([(1, 2), (2, 3), (3, 4)])
    assert tax.depth[1] == 0
    assert tax.depth[2] == 1
    assert tax.depth[4] == 3
    assert tax.anc[4, 1] == 2
    assert tax.anc[4, 3] == 4


def test_cycle_detection():
    parent = np.array([1, 1, 3, 2], dtype=np.int32)  # 2<->3 cycle
    with pytest.raises(ValueError):
        Taxonomy(parent)


def test_fold_targets_interval_matches_fold_targets():
    """The chain-interval device fold (ops/fold.fold_targets_interval) must
    equal the reference-semantics scan fold on random trees and hit planes."""
    import jax.numpy as jnp

    from kmer_id_tpu.core.taxonomy import Taxonomy
    from kmer_id_tpu.ops.fold import fold_targets, fold_targets_interval

    rng = np.random.default_rng(17)
    for trial in range(6):
        n = int(rng.integers(6, 60))
        parent = np.full(n, 1, dtype=np.int32)
        for t in range(2, n):
            parent[t] = int(rng.integers(1, t))  # random tree, parents precede
        tax = Taxonomy(parent)
        chain3, _ = tax.chain_tables()
        b, p = 40, int(rng.integers(2, 12))
        targets = rng.integers(0, n, size=(b, p)).astype(np.int32)
        targets[rng.random((b, p)) < 0.5] = 0  # misses
        targets[targets == 1] = 0  # root is never a DB target
        want = np.asarray(
            fold_targets(jnp.asarray(tax.anc), jnp.asarray(tax.depth),
                         jnp.asarray(targets))
        )
        got = np.asarray(
            fold_targets_interval(jnp.asarray(chain3), jnp.asarray(targets))
        )
        assert (got == want).all(), (trial, np.nonzero(got != want))


def test_fold_targets_chain_matches_fold_targets():
    """The slim chain fold (ops/fold.fold_targets_chain, the fp engine's
    inconsistent branch) must equal the reference-semantics scan fold on
    random trees and hit planes, with (tin, tout) supplied per hit the way
    the verify rows supply them (garbage on miss lanes)."""
    import jax.numpy as jnp

    from kmer_id_tpu.core.taxonomy import Taxonomy
    from kmer_id_tpu.ops.fold import fold_targets, fold_targets_chain

    rng = np.random.default_rng(23)
    for trial in range(6):
        n = int(rng.integers(6, 60))
        parent = np.full(n, 1, dtype=np.int32)
        for t in range(2, n):
            parent[t] = int(rng.integers(1, t))
        tax = Taxonomy(parent)
        chain3, _ = tax.chain_tables()
        b, p = 40, int(rng.integers(2, 12))
        targets = rng.integers(0, n, size=(b, p)).astype(np.int32)
        targets[rng.random((b, p)) < 0.5] = 0
        targets[targets == 1] = 0
        tin = tax.tin[targets].astype(np.int32)
        tout = tax.tout[targets].astype(np.int32)
        # miss lanes carry garbage intervals, as rec rows do for holes
        garbage = targets == 0
        tin[garbage] = rng.integers(0, 1 << 20, size=int(garbage.sum()))
        tout[garbage] = rng.integers(0, 1 << 20, size=int(garbage.sum()))
        want = np.asarray(
            fold_targets(jnp.asarray(tax.anc), jnp.asarray(tax.depth),
                         jnp.asarray(targets))
        )
        got = np.asarray(
            fold_targets_chain(jnp.asarray(chain3), jnp.asarray(targets),
                               jnp.asarray(tin), jnp.asarray(tout))
        )
        assert (got == want).all(), (trial, np.nonzero(got != want))
