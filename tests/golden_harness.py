"""Golden-test harness: compile and run the reference C++ for comparison.

The reference sources are compiled *at test time* into a gitignored cache,
with only their memory-size constants reduced (MAXHASH 2^35→2^26 for the
builder, 2^30→2^22 for classifiers) so the fixtures fit CI memory — the same
memory-only tweak used for the verified run in SURVEY.md §8.  Nothing from
the reference enters the framework; these binaries exist purely to produce
golden outputs that kmer_id_tpu must match byte-for-byte.
"""

from __future__ import annotations

import gzip
import os
import shutil
import subprocess

import numpy as np

REF_DIR = "/root/reference"
CACHE = os.path.join(os.path.dirname(__file__), ".cache")


def _compile(src_name: str, out_name: str, subs: list[tuple[str, str]]) -> str | None:
    """Copy a reference source, apply constant substitutions, compile."""
    os.makedirs(CACHE, exist_ok=True)
    out = os.path.join(CACHE, out_name)
    src_path = os.path.join(REF_DIR, src_name)
    if not os.path.exists(src_path) or shutil.which("g++") is None:
        return None
    if os.path.exists(out) and os.path.getmtime(out) > os.path.getmtime(src_path):
        return out
    with open(src_path) as f:
        code = f.read()
    for old, new in subs:
        if old not in code:
            raise RuntimeError(f"substitution target not found in {src_name}: {old}")
        code = code.replace(old, new)
    tweaked = os.path.join(CACHE, out_name + ".cpp")
    with open(tweaked, "w") as f:
        f.write(code)
    r = subprocess.run(
        ["g++", "-O2", "-std=c++11", tweaked, "-o", out, "-lz"],
        capture_output=True,
        text=True,
    )
    if r.returncode != 0:
        raise RuntimeError(f"g++ failed for {src_name}:\n{r.stderr[-2000:]}")
    return out


def build_binary() -> str | None:
    return _compile(
        "kmer_build_vf6.cpp",
        "ref_build",
        [("const ktype MAXHASH = (1LL << 35);", "const ktype MAXHASH = (1LL << 26);")],
    )


def classifier_vf6_binary() -> str | None:
    return _compile(
        "kmer_read_vf6.cpp",
        "ref_read_vf6",
        [("const itype MAXHASH = (1 << 30);", "const itype MAXHASH = (1 << 22);")],
    )


def classifier_m3_binary() -> str | None:
    return _compile(
        "kmer_read_m3.cpp",
        "ref_read_m3",
        [("const itype MAXHASH = (1 << 30);", "const itype MAXHASH = (1 << 22);")],
    )


def murmur_fmix64(k: np.ndarray) -> np.ndarray:
    """MurmurHash3 finalizer (the reference's integerHash) for collision checks."""
    k = np.asarray(k, dtype=np.uint64).copy()
    with np.errstate(over="ignore"):
        k ^= k >> np.uint64(33)
        k *= np.uint64(0xFF51AFD7ED558CCD)
        k ^= k >> np.uint64(33)
        k *= np.uint64(0xC4CEB9FE1A85EC53)
        k ^= k >> np.uint64(33)
    return k


def assert_no_builder_collisions(keys: np.ndarray, maxhash_log2: int = 26) -> None:
    """The reference builder table is keyless: a collision would make the
    golden comparison diverge by design, so fixtures must avoid them."""
    idx = murmur_fmix64(keys) & np.uint64((1 << maxhash_log2) - 1)
    assert len(np.unique(idx)) == len(np.unique(keys)), (
        "fixture keys collide in the reference's 2^%d table; reseed fixture"
        % maxhash_log2
    )


def gzip_file(src: str, dst: str) -> None:
    with open(src, "rb") as fi, gzip.open(dst, "wb") as fo:
        shutil.copyfileobj(fi, fo)


def run(binary: str, args: list[str], cwd: str, timeout: int = 120,
        retries: int = 2) -> subprocess.CompletedProcess:
    """Run a reference binary; on timeout, retry (default 120 s x 3).

    Compiled golden binaries intermittently wedge AFTER printing ALL their
    progress output (observed twice across full-suite runs, under host CPU
    saturation; the same fixture passes in seconds in isolation — an
    environment/IO flake, not a semantic failure).  Every harness fixture
    is tiny (healthy runs complete in seconds), so a short timeout + fresh
    retries turn a transient wedge into seconds of delay instead of a
    10-minute `-x` suite abort; the captured output of each timed-out
    attempt is printed for diagnosis.
    """
    last = None
    for attempt in range(retries + 1):
        try:
            return subprocess.run(
                [binary] + args, cwd=cwd, capture_output=True, text=True,
                timeout=timeout,
            )
        except subprocess.TimeoutExpired as e:
            last = e
            print(
                f"[golden] {binary} timed out after {timeout}s "
                f"(attempt {attempt + 1}/{retries + 1}); "
                f"stdout tail: {(e.stdout or b'')[-300:]!r}",
                flush=True,
            )
    raise last
