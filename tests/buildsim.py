"""Dict-based builder oracle: the reference's 3 passes, collision-free.

Transliterates the observable semantics of kmer_build_vf6.cpp (HashAdd CA
merge + saturation poisoning, HashRemove, destructive getHash, emission
gates) using an exact dict keyed by canonical k-mer, for testing the
vectorized sort-based builder.
"""

from __future__ import annotations

from tests.oracles import KSIZE, ca_ref, check_entropy_ref, rolling_kmers

MAXREP = 2048


class BuildSim:
    def __init__(self, parent: list[int], ntargorgs: list[int], max_probes=100000):
        self.parent = parent
        self.ntargorgs = ntargorgs
        self.max_probes = max_probes
        self.cells: dict[int, int] = {}  # key -> packed (target<<11)|count
        self.pcount = [0] * len(ntargorgs)
        self.probes: list[tuple[str, int, int, int, str, int]] = []

    def hash_add(self, key: int, targi: int) -> None:
        v = self.cells.get(key, 0)
        target = v >> 11
        if v == 0:
            self.cells[key] = (targi << 11) | 1
        elif target > 1:
            target = ca_ref(self.parent, target, targi)
            count = v & (MAXREP - 1)
            if count == MAXREP - 1:
                self.cells[key] = 1
            else:
                self.cells[key] = (target << 11) | (count + 1)

    def hash_remove(self, key: int) -> None:
        if self.cells.get(key, 0) > 1:
            self.cells[key] = 1

    def get_hash(self, key: int) -> tuple[int, int]:
        v = self.cells.get(key, 0)
        self.cells[key] = 1  # DO NOT REUSE
        return v >> 11, v & (MAXREP - 1)

    def pass1(self, genome: str, targi: int) -> None:
        for _, _, _, key in rolling_kmers(genome):
            self.hash_add(key, targi)

    def pass2(self, genome: str) -> None:
        for _, _, _, key in rolling_kmers(genome):
            self.hash_remove(key)

    def pass3(self, genome: str, org: int) -> None:
        minpos = -1
        for gpos, kf, kr, key in rolling_kmers(genome):
            target, count = self.get_hash(key)
            strand = "F" if kf < kr else "R"
            n = self.ntargorgs[target] if target < len(self.ntargorgs) else 0
            if n == 1:
                minct = 1
            elif n < 4:
                minct = 2
            elif n < 10:
                minct = n - 2
            else:
                minct = n // 5 + 1
            if (
                target > 1
                and count >= minct
                and gpos > minpos
                and self.pcount[target] < self.max_probes
            ):
                from kmer_id_tpu.core.codec import key_to_string

                kmer = key_to_string(key)
                if check_entropy_ref(kmer):
                    self.probes.append((kmer, target, org, gpos, strand, count))
                    minpos = gpos + KSIZE
                    self.pcount[target] += 1
