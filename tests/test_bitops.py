"""Bit utilities vs naive per-nucleotide reference semantics
(src/kmer_bitset.cpp:65-119, src/kmers.cpp:16-35)."""
import numpy as np

import jax.numpy as jnp

from spaced_kmer_sketching_tpu.ops.bitops import (canonical_kmer,
                                                  reverse_complement,
                                                  reverse_complement_lanes,
                                                  reverse_kmer_bitset,
                                                  reverse_kmer_lanes)


def naive_reverse(value: int) -> int:
    """Reverse the 64 2-bit codes by string manipulation."""
    codes = [(value >> (2 * i)) & 3 for i in range(64)]
    out = 0
    for i, c in enumerate(reversed(codes)):
        out |= c << (2 * i)
    return out


def to_lanes(v: int):
    return [jnp.uint32((v >> (32 * i)) & 0xFFFFFFFF) for i in range(4)]


def from_lanes(ws):
    return sum(int(np.uint32(w)) << (32 * i) for i, w in enumerate(ws))


def test_reverse_matches_naive():
    rng = np.random.default_rng(0)
    for _ in range(50):
        v = int.from_bytes(rng.bytes(16), "little")
        assert reverse_kmer_bitset(v) == naive_reverse(v)


def test_reverse_device_matches_host():
    rng = np.random.default_rng(1)
    for _ in range(20):
        v = int.from_bytes(rng.bytes(16), "little")
        got = from_lanes(reverse_kmer_lanes(to_lanes(v)))
        assert got == reverse_kmer_bitset(v)


def test_reverse_complement_semantics():
    # window w k-mer in low 2w bits; revcomp = complement codes in reverse
    rng = np.random.default_rng(2)
    for w in (5, 20, 31, 64):
        codes = rng.integers(0, 4, w)
        v = 0
        for i, c in enumerate(codes):          # codes[0] oldest at top
            v = (v << 2) | int(c)
        rc = reverse_complement(v, w)
        want = 0
        for c in reversed(codes):
            want = (want << 2) | (3 - int(c))
        assert rc == want
        got = from_lanes(reverse_complement_lanes(to_lanes(v), w))
        assert got == want


def test_canonical_is_min():
    assert canonical_kmer(5, 9) == 5
    assert canonical_kmer(9, 5) == 5
    assert canonical_kmer(7, 7) == 7
