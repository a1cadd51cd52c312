"""128-bit k-mer bit utilities: nucleotide-granular reversal, complement,
canonicalization — host (python int) and device (4 x uint32 lanes) versions.

Parity targets:
  * reverse_kmer_bitset — butterfly reversal at 2-bit (nucleotide)
    granularity over the 128-bit window (src/kmer_bitset.cpp:65-119; the
    reference precomputes 6 alternating-block masks and swaps blocks of
    2,4,...,64 bits).  Here the same butterfly runs as constant-mask
    shift/AND/OR passes, identical on host ints and uint32 lanes.
  * reverse_complement — reverse, flip all bits, shift right by
    (MAX_KMER_LENGTH - window) * 2 to re-align (src/kmers.cpp:16-28).
  * canonical_kmer — min of (kmer, revcomp) by masked value
    (src/kmers.cpp:31-35).  NOTE: the live pipeline canonicalizes via the
    dual-window scheme (ops/extract.py); these helpers replicate the
    reference's standalone utility path (retained dead code,
    src/kmer_sliding.cpp:61-98) for capability parity.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..config import KMER_BITSET_SIZE, MAX_KMER_LENGTH

_MASK128 = (1 << KMER_BITSET_SIZE) - 1

# butterfly passes at growing block sizes, starting at nucleotide (2-bit)
# granularity: swap adjacent blocks of 2, 4, 8, 16, 32, 64 bits.
_PASSES = [2, 4, 8, 16, 32, 64]


def _alternating_mask(block: int) -> int:
    """128-bit mask with alternating `block`-bit groups set (low group set)."""
    m = 0
    for start in range(0, KMER_BITSET_SIZE, 2 * block):
        m |= ((1 << block) - 1) << start
    return m


_HOST_MASKS = {b: _alternating_mask(b) for b in _PASSES}


def reverse_kmer_bitset(value: int) -> int:
    """Reverse the order of the 64 nucleotide (2-bit) codes in a 128-bit
    value (src/kmer_bitset.cpp:105-119)."""
    v = value & _MASK128
    for b in _PASSES:
        m = _HOST_MASKS[b]
        v = ((v & m) << b) | ((v >> b) & m)
    return v


def reverse_complement(kmer_bits: int, window: int) -> int:
    """Reverse complement of a window-length k-mer held in the low bits
    (src/kmers.cpp:16-28)."""
    rev = reverse_kmer_bitset(kmer_bits)
    flipped = (~rev) & _MASK128
    return flipped >> ((MAX_KMER_LENGTH - window) * 2)


def canonical_kmer(masked_a: int, masked_b: int) -> int:
    """Numeric min — the reference's canonical pick (src/kmers.cpp:31-35)."""
    return masked_a if masked_a < masked_b else masked_b


# ---- device versions over 4 x uint32 little-endian lanes ---------------------

def _rev32_2bit(w):
    """Reverse the 16 2-bit groups within each uint32 lane."""
    m2 = jnp.uint32(0x33333333)
    w = ((w & m2) << 2) | ((w >> 2) & m2)
    m4 = jnp.uint32(0x0F0F0F0F)
    w = ((w & m4) << 4) | ((w >> 4) & m4)
    m8 = jnp.uint32(0x00FF00FF)
    w = ((w & m8) << 8) | ((w >> 8) & m8)
    return (w << 16) | (w >> 16)


def reverse_kmer_lanes(words):
    """Device reversal: [w0, w1, w2, w3] -> nucleotide-reversed lanes."""
    return [_rev32_2bit(words[3]), _rev32_2bit(words[2]),
            _rev32_2bit(words[1]), _rev32_2bit(words[0])]


def reverse_complement_lanes(words, window: int):
    """Device reverse complement with the reference's re-alignment shift."""
    rev = [~w for w in reverse_kmer_lanes(words)]
    shift = (MAX_KMER_LENGTH - window) * 2
    return shift_right_lanes(rev, shift)


def shift_right_lanes(words, r: int):
    """Logical right shift of a 128-bit 4-lane value by static r bits."""
    q, s = divmod(r, 32)
    out = []
    for i in range(4):
        lo = words[i + q] if i + q < 4 else jnp.zeros_like(words[0])
        if s == 0:
            out.append(lo)
            continue
        hi = words[i + q + 1] if i + q + 1 < 4 else jnp.zeros_like(words[0])
        out.append((lo >> s) | (hi << (32 - s)))
    return out
