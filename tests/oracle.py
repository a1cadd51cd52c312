"""Pure-Python oracle of the full reference pipeline, on plain ints.

Deliberately the dumbest possible re-statement of the semantics documented in
SURVEY.md §0/§3 — every device op is validated against this on small inputs,
and this in turn is cross-checked against the independent C++ scalar pipeline
(native/sketchlib.cpp).
"""
from __future__ import annotations

from typing import Iterable, List, Set

from spaced_kmer_sketching_tpu.utils.boosthash import hash_bitset128
import numpy as np

MASK128 = (1 << 128) - 1


def windows_of_run(codes: Iterable[int], window: int):
    """Yield (fwd, rc) 128-bit window values per position, reference layout."""
    codes = [int(c) for c in codes]
    if len(codes) < window:
        return
    fwd = 0
    rc = 0
    top = 2 * (window - 1)
    for i, c in enumerate(codes):
        fwd = ((fwd << 2) | c) & MASK128
        rc = (rc >> 2) | ((c ^ 3) << top)
        if i >= window - 1:
            yield fwd, rc


def oracle_hash(value128: int, variant: str = "modern") -> int:
    lo = np.uint64(value128 & 0xFFFFFFFFFFFFFFFF)
    hi = np.uint64(value128 >> 64)
    return int(hash_bitset128(lo, hi, variant))


def oracle_sketch(runs: List[List[int]], mask: int, window: int, salt: int,
                  scale: int = 200, variant: str = "modern") -> Set[int]:
    """Set of kept canonical masked 128-bit keys."""
    kept: Set[int] = set()
    for run in runs:
        for fwd, rc in windows_of_run(run, window):
            mf, mr = fwd & mask, rc & mask
            canon = mf if mf < mr else mr
            if (oracle_hash(canon, variant) ^ salt) % scale == 0:
                kept.add(canon)
    return kept


def oracle_all_windows(runs: List[List[int]], mask: int, window: int):
    """All canonical masked keys (no filter), for extraction-op tests."""
    out = []
    for run in runs:
        for fwd, rc in windows_of_run(run, window):
            mf, mr = fwd & mask, rc & mask
            out.append(mf if mf < mr else mr)
    return out


def oracle_containment(intersection: int, set_size: int) -> float:
    return 0.0 if intersection == 0 else intersection / set_size


def oracle_ani(containment: float, k: int) -> float:
    return 0.0 if containment <= 0 else containment ** (1.0 / k)


def random_genome(rng, n: int) -> List[int]:
    return list(rng.integers(0, 4, n))


def mutate(rng, codes: List[int], rate: float) -> List[int]:
    out = list(codes)
    for i in range(len(out)):
        if rng.random() < rate:
            out[i] = int(rng.integers(0, 4))
    return out
