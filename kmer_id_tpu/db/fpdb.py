"""Fingerprint-cuckoo probe DB: the transfer-light device lookup layout.

Motivation (measured on the target chip): XLA random gathers cost ~6-25 ms per
1M queries and scale with *bytes per row*, so the lookup layout should make
the per-window probe as narrow as possible and defer the wide payload to the
few windows that actually hit.  The reference's per-kmer hash probe
(``newkmer_10nx.cpp:204-233``) becomes:

1. **Fingerprint stage** (every window): two 16-byte row-gathers into
   ``fptab`` — a 2-choice cuckoo table of 8 x u16 fingerprints per bucket.
   A window is a *candidate* iff its fingerprint matches a slot in either
   bucket.  Build-time invariant: no bucket holds two equal fingerprints, so
   a bucket yields at most one candidate slot and a present key is found in
   exactly one of its two buckets.
2. **Verify stage** (candidates only, compacted to <= max_hits per read):
   one 16-byte row-gather into ``rec`` fetches the slot's full 60-bit key
   (exactness: fingerprints only pre-filter; the key compare decides) plus a
   taxonomy payload — ``tin``/``tout`` DFS interval labels and ``depth`` of
   the probe's target (core/taxonomy.py) — so the per-read MSCA consistency
   fold needs **zero** additional gathers.

False fingerprint matches (~8 * 2^-16 per miss window) cost one wasted verify
row and are rejected exactly.  Misses never touch ``rec``.

Slot id = bucket * 8 + slot is the engine's per-probe identity: the host keeps
``slot_target`` / ``slot_idx`` (sorted-order index) maps for final-call
resolution, the per-sample unique-k-mer ``seen`` set, and interop with the
sorted-array layout used by the sharded/verify paths.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

SLOTS = 8
EMPTY_HI = np.uint32(0xFFFFFFFF)  # real key hi < 2^28
# Bucket-count target: nb is snapped to a power of two, so the worst-case
# realized load equals this value.  0.96 (near the 2-choice x 8-slot cuckoo
# threshold ~0.977) forces the Python random-walk eviction loop to place the
# last few percent — measured 800+ s on an 8M-key build.  At <= 0.85 the
# vectorized greedy rounds place everything and build time is sort-bound
# (seconds), at the cost of at most ~13% more slots (16 B each).
MAX_LOAD = 0.85


def _mix32(a: np.ndarray, b: np.ndarray, s1: int, s2: int) -> np.ndarray:
    x = a ^ (b * np.uint32(s1))
    x ^= x >> np.uint32(15)
    x *= np.uint32(0x2C1B3C6D)
    x ^= x >> np.uint32(12)
    x *= np.uint32(s2)
    x ^= x >> np.uint32(16)
    return x


def fp_hashes(hi: np.ndarray, lo: np.ndarray, nb: int, s1: int, s2: int, s3: int):
    """(bucket1, bucket2, fingerprint) for key words — numpy mirror of the
    device hash in ops/lookup.fp_lookup (kept bit-identical by tests)."""
    hi = np.asarray(hi, dtype=np.uint32)
    lo = np.asarray(lo, dtype=np.uint32)
    mask = np.uint32(nb - 1)
    b1 = _mix32(hi, lo, s1, s2) & mask
    b2 = _mix32(lo, hi, s2, s1) & mask
    m = _mix32(hi ^ np.uint32(0x6A09E667), lo, s3, s1)
    fp = ((m ^ (m >> np.uint32(16))) & np.uint32(0xFFFF)).astype(np.uint16)
    fp = np.where(fp == 0, np.uint16(1), fp)  # 0 = empty slot sentinel
    return b1.astype(np.int64), b2.astype(np.int64), fp


@dataclass
class FpDB:
    """Device-ready fingerprint layout + host-side slot maps."""

    fptab: np.ndarray  # uint32 [nb, 4] — 8 u16 fps; slot s at word s&3, half s>>2
    rec: np.ndarray  # uint32 [nb*8, 4] — (key_hi, key_lo, tin, tout | depth<<24)
    nb: int
    s1: int
    s2: int
    s3: int
    slot_target: np.ndarray  # int32 [nb*8]; 0 for empty slots
    slot_idx: np.ndarray  # int32 [nb*8]; index into the sorted packed arrays, -1 empty

    @property
    def n_slots(self) -> int:
        return self.nb * SLOTS

    def device_arrays(self) -> dict:
        return {"fptab": self.fptab, "rec": self.rec}


def build_fpdb(packed, taxonomy, load: float = MAX_LOAD) -> FpDB:
    """Build from a PackedDB (sorted unique keys) + Taxonomy.

    Probes with target <= 0 are excluded: in the reference a cell with value 0
    terminates probing, so such entries always read back as misses
    (``newkmer_10nx.cpp:223-233``) — dropping them is behavior-preserving.
    """
    live = np.nonzero(packed.target > 0)[0].astype(np.int64)
    hi = np.ascontiguousarray(packed.hi[live], dtype=np.uint32)
    lo = np.ascontiguousarray(packed.lo[live], dtype=np.uint32)
    target = packed.target[live].astype(np.int64)
    n = len(hi)
    nt = taxonomy.num_nodes
    if nt > (1 << 24) or taxonomy.max_depth > 254:
        raise ValueError("taxonomy too large for fp payload packing")
    nb = 1 << max(4, int(np.ceil(np.log2(max(n, 1) / (SLOTS * load)))))
    while True:
        for attempt in range(6):
            s1 = 0x9E3779B1 + attempt * 7919
            s2 = 0x85EBCA6B + attempt * 104729
            s3 = 0xC2B2AE35 + attempt * 65537
            slot_of = _place(hi, lo, nb, s1, s2, s3)
            if slot_of is not None:
                fptab = np.zeros(nb * SLOTS, dtype=np.uint16)
                _, _, fp = fp_hashes(hi, lo, nb, s1, s2, s3)
                # slot s of bucket b lives at word (s & 3), u16 half (s >> 2):
                # flat u16 index b*8 + s, so the device's match index
                # (half*4 + word) equals s and cand = bucket*8 + s = slot id.
                fptab[slot_of] = fp
                fptab = fptab.reshape(nb, 2, 4)  # [bucket, half, word]
                fptab32 = (
                    fptab[:, 0, :].astype(np.uint32)
                    | (fptab[:, 1, :].astype(np.uint32) << np.uint32(16))
                )
                rec = np.zeros((nb * SLOTS, 4), dtype=np.uint32)
                rec[:, 0] = EMPTY_HI
                tgt_clip = np.clip(target, 0, nt - 1)
                rec[slot_of, 0] = hi
                rec[slot_of, 1] = lo
                rec[slot_of, 2] = taxonomy.tin[tgt_clip].astype(np.uint32)
                rec[slot_of, 3] = taxonomy.tout[tgt_clip].astype(np.uint32) | (
                    taxonomy.depth[tgt_clip].astype(np.uint32) << np.uint32(24)
                )
                slot_target = np.zeros(nb * SLOTS, dtype=np.int32)
                slot_target[slot_of] = target
                slot_idx = np.full(nb * SLOTS, -1, dtype=np.int32)
                slot_idx[slot_of] = live
                return FpDB(
                    fptab=fptab32, rec=rec, nb=nb, s1=s1, s2=s2, s3=s3,
                    slot_target=slot_target, slot_idx=slot_idx,
                )
        nb *= 2


def _place(hi, lo, nb, s1, s2, s3, max_evict_rounds: int = 3000):
    """Assign each key a slot honoring capacity + per-bucket fp uniqueness.

    Two fully-vectorized phases (build time on multi-10M-key DBs is
    sort-bound, not Python-bound):

    1. *Greedy rounds*: every unplaced key tries the emptier of its two
       buckets; placement is capacity-ranked per bucket and deferred on
       fingerprint conflicts.  Converges to ~3% stragglers at load 0.85.
    2. *Parallel random-walk eviction*: all stragglers hop at once each
       round — pick a random side, displace a same-fingerprint resident if
       present (which simultaneously restores fp uniqueness), else take an
       empty slot, else kick a random resident (who rejoins the walk).
       Same-slot / same-(bucket, fp) write races are resolved by keeping one
       winner per round; losers retry next round.
    """
    n = len(hi)
    b1, b2, fp = fp_hashes(hi, lo, nb, s1, s2, s3)
    fp = fp.astype(np.int64)
    occ = np.zeros(nb, dtype=np.int64)
    slot_fp = np.zeros(nb * SLOTS, dtype=np.int64)  # 0 = empty
    slot_key = np.full(nb * SLOTS, -1, dtype=np.int64)
    slot_of = np.full(n, -1, dtype=np.int64)

    def bucket_has_fp(b, f):
        rows = slot_fp.reshape(nb, SLOTS)[b]
        return (rows == f[:, None]).any(axis=1)

    unplaced = np.arange(n)
    for rnd in range(30):
        if len(unplaced) == 0:
            return slot_of
        f1 = occ[b1[unplaced]]
        f2 = occ[b2[unplaced]]
        bb = np.where(f2 < f1, b2[unplaced], b1[unplaced])
        ff = fp[unplaced]
        # defer same-round duplicates of (bucket, fp) and existing-fp conflicts
        key = bb * 65536 + ff
        order = np.argsort(key, kind="stable")
        ks = key[order]
        first = np.concatenate([[True], ks[1:] != ks[:-1]])
        cand = order[first]
        cand = cand[~bucket_has_fp(bb[cand], ff[cand])]
        # capacity-limited placement (rank within bucket this round)
        bsel = bb[cand]
        o2 = np.argsort(bsel, kind="stable")
        bs = bsel[o2]
        fb = np.concatenate([[True], bs[1:] != bs[:-1]])
        starts = np.where(fb, np.arange(len(bs)), 0)
        np.maximum.accumulate(starts, out=starts)
        rank = np.arange(len(bs)) - starts
        fits = rank < (SLOTS - occ[bs])
        placed_local = cand[o2[fits]]
        slots = bs[fits] * SLOTS + occ[bs[fits]] + rank[fits]
        gidx = unplaced[placed_local]
        slot_of[gidx] = slots
        slot_fp[slots] = fp[gidx]
        slot_key[slots] = gidx
        np.add.at(occ, bs[fits], 1)
        mask = np.ones(len(unplaced), bool)
        mask[placed_local] = False
        unplaced = unplaced[mask]
        if len(unplaced) and rnd > 4 and len(placed_local) == 0:
            break  # greedy fixed point; hand off to eviction

    rng = np.random.default_rng(s1 & 0x7FFFFFFF)
    pend = unplaced
    rows2d = slot_fp.reshape(nb, SLOTS)
    for _ in range(max_evict_rounds):
        u = len(pend)
        if u == 0:
            return slot_of
        side = rng.integers(0, 2, size=u)
        b = np.where(side == 0, b1[pend], b2[pend])
        rows = rows2d[b]  # [U, 8] fingerprints currently in the bucket
        ff = fp[pend]
        conf = rows == ff[:, None]
        has_conf = conf.any(axis=1)
        empt = rows == 0
        has_empt = empt.any(axis=1)
        s = np.where(
            has_conf,
            conf.argmax(axis=1),
            np.where(has_empt, empt.argmax(axis=1), rng.integers(0, SLOTS, size=u)),
        )
        pos = b * SLOTS + s
        # one winner per slot AND per (bucket, fp) pair this round
        k1 = np.unique(pos, return_index=True)[1]
        k2 = np.unique(b * 65536 + ff, return_index=True)[1]
        win = np.intersect1d(k1, k2, assume_unique=True)
        wk = pend[win]
        wpos = pos[win]
        victim = slot_key[wpos]
        slot_fp[wpos] = fp[wk]
        slot_key[wpos] = wk
        slot_of[wk] = wpos
        evicted = victim[victim >= 0]
        slot_of[evicted] = -1
        lose = np.ones(u, dtype=bool)
        lose[win] = False
        pend = np.concatenate([pend[lose], evicted])
    return None  # no convergence: caller re-salts / doubles nb


def save_fpdb(db: FpDB, out_dir) -> None:
    """Persist alongside the packed artifact (same load-once philosophy as
    db/probes.save_packed: text parse + table build happen one time)."""
    import json
    import os

    os.makedirs(out_dir, exist_ok=True)
    np.save(os.path.join(out_dir, "fptab.npy"), db.fptab)
    np.save(os.path.join(out_dir, "rec.npy"), db.rec)
    np.save(os.path.join(out_dir, "slot_target.npy"), db.slot_target)
    np.save(os.path.join(out_dir, "slot_idx.npy"), db.slot_idx)
    with open(os.path.join(out_dir, "fp_manifest.json"), "w") as f:
        json.dump({"nb": db.nb, "s1": db.s1, "s2": db.s2, "s3": db.s3}, f)


def load_fpdb(in_dir, mmap: bool = True) -> FpDB | None:
    import json
    import os

    mpath = os.path.join(in_dir, "fp_manifest.json")
    if not os.path.exists(mpath):
        return None
    with open(mpath) as f:
        m = json.load(f)
    mode = "r" if mmap else None

    def arr(name):
        return np.load(os.path.join(in_dir, f"{name}.npy"), mmap_mode=mode)

    return FpDB(
        fptab=arr("fptab"), rec=arr("rec"), nb=int(m["nb"]),
        s1=int(m["s1"]), s2=int(m["s2"]), s3=int(m["s3"]),
        slot_target=np.asarray(arr("slot_target")),
        slot_idx=np.asarray(arr("slot_idx")),
    )


def verify_fpdb(db: FpDB, hi: np.ndarray, lo: np.ndarray) -> None:
    """Invariant check (used by tests): every key resolves through the same
    two-bucket fingerprint probe the device performs, uniquely."""
    b1, b2, fp = fp_hashes(hi, lo, db.nb, db.s1, db.s2, db.s3)
    fps = np.stack(
        [
            (db.fptab >> np.uint32(16 * half))[:, w] & np.uint32(0xFFFF)
            for half in (0, 1)
            for w in range(4)
        ],
        axis=1,
    ).astype(np.int64)  # [nb, 8] in device slot order (half * 4 + word)
    m1 = fps[b1] == fp[:, None].astype(np.int64)
    m2 = fps[b2] == fp[:, None].astype(np.int64)
    assert ((m1.sum(1) + m2.sum(1) * (b1 != b2)) >= 1).all(), "key lost"
    # per-bucket uniqueness
    srt = np.sort(fps, axis=1)
    dup = (srt[:, 1:] == srt[:, :-1]) & (srt[:, 1:] != 0)
    assert not dup.any(), "duplicate fingerprint in a bucket"
