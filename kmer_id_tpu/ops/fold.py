"""Vectorized taxonomy queries and the ordered per-read MSCA fold.

The classifier folds each read's k-mer hits into one taxonomy node with
``final = msca(target, final)`` (``newkmer_10nx.cpp:588-595``).  ``msca`` is
commutative but **not associative**: a fold mixing incomparable hits (which
resolve to an LCA) with deeper hits (which re-descend) depends on hit order.
Exact parity therefore requires folding hits in the reference's order —
ascending k-mer end position, reads in file order.  We keep the fold exact by
scanning positions left-to-right with a [batch]-wide carry: the scan is
sequential over ≤ L-29 tiny steps, but each step is a fully vectorized
msca over the whole batch (a handful of gathers into the ancestor table), so
the batch dimension keeps the VPU busy.

``msca``/``lca`` are computed from the ancestor-at-depth table built in
core/taxonomy.py — O(1) gathers for comparability tests and a log2(max_depth)
binary search for LCA, instead of the reference's pointer-chasing set walks.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def _anc_at(anc: jax.Array, node: jax.Array, d: jax.Array) -> jax.Array:
    """anc[node, d] with clipped gather indices."""
    dcl = jnp.clip(d, 0, anc.shape[1] - 1)
    return anc[node, dcl]


def _is_anc_or_self(anc, depth, y, x):
    """True where y is an ancestor of x or y == x."""
    dy = depth[y]
    return (dy <= depth[x]) & (_anc_at(anc, x, dy) == y)


def lca_jnp(anc: jax.Array, depth: jax.Array, x: jax.Array, y: jax.Array) -> jax.Array:
    """Lowest common ancestor-or-self (builder ``ca``, kmer_build_vf6.cpp:99-118)."""
    dmin = jnp.minimum(depth[x], depth[y])
    lo = jnp.zeros_like(dmin)  # depth 0 (root) is always common
    hi = dmin
    steps = max(1, math.ceil(math.log2(anc.shape[1] + 1)) + 1)
    for _ in range(steps):
        mid = (lo + hi + 1) >> 1
        same = _anc_at(anc, x, mid) == _anc_at(anc, y, mid)
        lo = jnp.where(same, mid, lo)
        hi = jnp.where(same, hi, mid - 1)
    return _anc_at(anc, x, lo)


def msca_jnp(anc: jax.Array, depth: jax.Array, x: jax.Array, y: jax.Array) -> jax.Array:
    """Classifier fold op (``newkmer_10nx.cpp:118-144``), batch-vectorized.

    Comparable pairs resolve to the descendant (more specific node);
    incomparable pairs to their LCA.  Arguments must be valid node ids
    (callers guard the 0 = "no hit" sentinel).
    """
    n = anc.shape[0]
    x = jnp.clip(x, 0, n - 1)
    y = jnp.clip(y, 0, n - 1)
    y_anc_x = _is_anc_or_self(anc, depth, y, x)
    x_anc_y = _is_anc_or_self(anc, depth, x, y)
    return jnp.where(y_anc_x, x, jnp.where(x_anc_y, y, lca_jnp(anc, depth, x, y)))


def compact_hits(anc: jax.Array, depth: jax.Array, targets: jax.Array, max_hits: int):
    """Scan-free per-read hit summarization (the production fold path).

    For each read row of per-window targets (0 = miss), computes:

    * ``hits`` int32 [B, max_hits] — the first ``max_hits`` hit targets in
      window order (rank-compaction scatter, no sequential scan);
    * ``nhits`` int32 [B] — total hits (may exceed ``max_hits``);
    * ``deepest`` int32 [B] — a maximum-depth hit;
    * ``consistent`` bool [B] — True iff every hit is an ancestor-or-self of
      ``deepest``, i.e. the hit set lies on one root chain.  Then the
      reference's sequential msca fold provably returns ``deepest``
      (comparable pairs resolve to the deeper node at every step), so the
      final call is order-free and fully resolved on device.

    Inconsistent or overflowing rows (rare on real DBs, where probes are
    spaced >= 31 bases apart per genome) are folded exactly on the host from
    ``hits``/the full target plane; see engine.classify.resolve_finals.
    """
    b, p = targets.shape
    t = targets.astype(jnp.int32)
    hitm = t > 0
    rank = jnp.cumsum(hitm.astype(jnp.int32), axis=1)
    nhits = rank[:, -1]
    slot = jnp.where(hitm & (rank <= max_hits), rank - 1, max_hits)
    rows = jax.lax.broadcasted_iota(jnp.int32, (b, p), 0)
    hits = jnp.zeros((b, max_hits + 1), jnp.int32)
    hits = hits.at[rows, slot].set(t, mode="promise_in_bounds")[:, :max_hits]

    d = jnp.where(hitm, depth[jnp.clip(t, 0, depth.shape[0] - 1)], -1)
    arg = jnp.argmax(d, axis=1)
    deepest = jnp.take_along_axis(t, arg[:, None], axis=1)[:, 0]
    anc_ok = _is_anc_or_self(anc, depth, jnp.clip(t, 0, anc.shape[0] - 1),
                             jnp.clip(deepest[:, None], 0, anc.shape[0] - 1))
    consistent = jnp.all(anc_ok | ~hitm, axis=1)
    # Pack into ONE [B, max_hits+3] i32 plane: a single device->host transfer
    # per batch (tiny separate transfers are pathologically slow through some
    # PJRT transports).  Columns: 0=deepest, 1=nhits, 2=consistent, 3:=hits.
    return jnp.concatenate(
        [
            deepest[:, None].astype(jnp.int32),
            nhits[:, None].astype(jnp.int32),
            consistent[:, None].astype(jnp.int32),
            hits,
        ],
        axis=1,
    )


def fold_targets(
    anc: jax.Array,
    depth: jax.Array,
    targets: jax.Array,
    init: jax.Array | None = None,
) -> jax.Array:
    """Ordered per-read fold of k-mer hit targets.

    Args:
      targets: int32 [B, P]; per-window DB target, 0 = miss/invalid window.
        Window order along P must be the read's left-to-right k-mer order.
      init: optional int32 [B] carry (0 = none) for resuming a fold across
        chunked long sequences.

    Returns:
      int32 [B] final target per read (0 = unclassified), matching the
      reference's sequential ``final = msca(target, final)`` fold.
    """
    b, p = targets.shape
    final0 = jnp.zeros((b,), jnp.int32) if init is None else init.astype(jnp.int32)

    def step(final, t):
        # final = msca(t, final) when both positive; adopt t when final == 0
        # (newkmer_10nx.cpp:588-595).
        merged = msca_jnp(anc, depth, t, final)
        new = jnp.where(t > 0, jnp.where(final > 0, merged, t), final)
        return new, None

    final, _ = jax.lax.scan(step, final0, jnp.transpose(targets).astype(jnp.int32))
    return final
