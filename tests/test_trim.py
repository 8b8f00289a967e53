import numpy as np

from kmer_id_tpu.core.trim import trim_batch
from tests.oracles import trim_ref

rng = np.random.default_rng(2)


def _random_qual(n, lo=33, hi=74):
    return "".join(chr(int(c)) for c in rng.integers(lo, hi, size=n))


def test_trim_matches_reference_loops():
    quals = []
    # adversarial corpus: random, all-low, all-high, low edges, low windows
    for _ in range(300):
        n = int(rng.integers(1, 120))
        quals.append(_random_qual(n))
    for n in (1, 2, 3, 4, 5, 6, 31, 32):
        quals.append("0" * n)  # '0' < cutoff '1'
        quals.append("J" * n)
        quals.append("0" * (n // 2) + "J" * (n - n // 2))
        quals.append("J" * (n // 2) + "0" * (n - n // 2))
    # low-quality window in the middle
    quals.append("J" * 30 + "0" * 10 + "J" * 30)
    quals.append("2" * 50)  # just above cutoff per-base, window sum 200 >= 196
    quals.append("1" * 50)  # exactly cutoff, window sum 196
    quals.append("1005" * 20)

    maxl = max(len(q) for q in quals)
    q = np.zeros((len(quals), maxl), dtype=np.uint8)
    lens = np.zeros(len(quals), dtype=np.int64)
    for i, s in enumerate(quals):
        b = s.encode()
        q[i, : len(b)] = np.frombuffer(b, dtype=np.uint8)
        lens[i] = len(b)
    start, stop, keep = trim_batch(q, lens)
    for i, s in enumerate(quals):
        e_start, e_stop, e_keep = trim_ref(s)
        assert (start[i], stop[i], bool(keep[i])) == (e_start, e_stop, e_keep), (
            i,
            s,
            (start[i], stop[i]),
            (e_start, e_stop),
        )
