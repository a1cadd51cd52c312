"""Bucketized sketch layouts for the Pallas all-pairs intersection kernel.

The reference computes |A ∩ B| by probing a hash map per element
(src/kmer_set.cpp:23-41).  A vectorized binary-search probe replaced that in
round 1, but gathers serialize on this TPU (measured 287 pairs/s end-to-end
— slower than one CPU thread).  TPU-native replacement: re-distribute each
sketch ONCE into a fixed (bucket, slot) layout keyed by a 64-bit mixing
hash; two sketches then intersect with nothing but aligned elementwise
equality compares across slot planes (no gathers, no sorts, no dynamic
shapes) — the op class the VPU is actually good at.

Layout (per sketch): B = bucket_factor * capacity buckets x S slots.
A key k goes to bucket mix64(k) >> (64-log2 B); the first S keys of a
bucket fill its slots, the rest SPILL to a host-side list (rare: bucket
loads are ~Poisson(count/B)).  Spilled keys are reconciled exactly on the
host against the canonical sorted sketches (`spill_correction`), so the
device kernel + correction is bit-exact against the reference semantics.

Slot entries are lane-packed so that sentinels can never fake a match:

* window <= 32 (2w <= 64 key bits, i.e. every config of the reference
  sweep's w=k branch up to k=32): entry = the INVERTIBLE mix of the 64-bit
  key — key equality <=> entry equality.  Lane 0 = mix[31:0]; lane 1 =
  mix[63-lb:32] with bit 31 as an always-set validity tag (the bucket bits
  of the mix are shared by construction and dropped).  NL = 2 lanes.
* window > 32: lanes 0..3 = the raw 128-bit key, lane 4 = 31 mix bits with
  the tag.  NL = 5 lanes.

Empty slots are all-zero in every lane.  The kernel ORs the LAST lane of
the column side with (lane == 0), so column sentinels become 1 while real
entries (tag bit set) are unchanged — row-sentinel (0) never equals
column-sentinel (1), and a sentinel never equals a real entry because real
entries carry the tag bit.  This makes one layout usable as both row and
column operand (G x G all-pairs reuses the same array on both sides).
"""
from __future__ import annotations

import numpy as np

LANES = 128
_M1 = np.uint64(0xBF58476D1CE4E5B9)
_M2 = np.uint64(0x94D049BB133111EB)
_TAG = np.uint32(0x80000000)


def mix64(z: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — a BIJECTION on uint64 (xorshifts and odd
    multiplies are invertible), so for 64-bit keys entry equality is key
    equality with no collision risk."""
    z = z.astype(np.uint64, copy=True)
    z ^= z >> np.uint64(30)
    z *= _M1
    z ^= z >> np.uint64(27)
    z *= _M2
    z ^= z >> np.uint64(31)
    return z


def _key_u64_parts(keys: np.ndarray):
    lo = keys[..., 0].astype(np.uint64) | (keys[..., 1].astype(np.uint64)
                                           << np.uint64(32))
    hi = keys[..., 2].astype(np.uint64) | (keys[..., 3].astype(np.uint64)
                                           << np.uint64(32))
    return lo, hi


def layout_lanes(window: int) -> int:
    return 2 if window <= 32 else 5


def build_bucket_layout(keys: np.ndarray, counts: np.ndarray, window: int,
                        *, slots: int = 4, bucket_factor: int = 2):
    """Bucketize sketches for the Pallas intersection kernel.

    keys: (G, cap, 4) uint32 sorted-unique sketch key lanes (little-endian
    128-bit rows, sentinel-padded past counts); counts: (G,) valid rows.

    Returns (planes, spills): planes (G, slots*NL, B/128, 128) uint32 with
    plane p = slot p//NL lane p%NL, flat bucket index = row*128 + lane;
    spills = list of G int arrays — indices into keys[g] of keys that
    overflowed their bucket (must be reconciled via spill_correction).
    """
    G, cap, _ = keys.shape
    B = bucket_factor * cap
    assert B & (B - 1) == 0 and B % LANES == 0, B
    lb = B.bit_length() - 1
    nl = layout_lanes(window)

    lo, hi = _key_u64_parts(keys)
    valid = np.arange(cap)[None, :] < np.asarray(counts)[:, None]
    if nl == 2:
        assert not np.any(hi[valid]), "window <= 32 implies high lanes zero"
        z = mix64(lo)
        entries = [
            (z & np.uint64(0xFFFFFFFF)).astype(np.uint32),
            (((z >> np.uint64(32))
              & np.uint64((1 << (32 - lb)) - 1)).astype(np.uint32) | _TAG),
        ]
    else:
        z = mix64(mix64(lo) ^ hi)
        entries = [keys[..., 0], keys[..., 1], keys[..., 2], keys[..., 3],
                   (z & np.uint64(0x7FFFFFFF)).astype(np.uint32) | _TAG]
    bucket = (z >> np.uint64(64 - lb)).astype(np.int64)

    # stable-sort each row by bucket (invalid rows to the back), then the
    # slot of a key = its rank inside its bucket run
    bkey = np.where(valid, bucket, B)
    order = np.argsort(bkey, axis=1, kind="stable")
    sb = np.take_along_axis(bkey, order, 1)
    idx = np.broadcast_to(np.arange(cap)[None, :], sb.shape)
    start = np.ones_like(sb, dtype=bool)
    start[:, 1:] = sb[:, 1:] != sb[:, :-1]
    rank = idx - np.maximum.accumulate(np.where(start, idx, 0), axis=1)
    ok = (sb < B) & (rank < slots)
    spilled = (sb < B) & (rank >= slots)

    gidx, pos = np.nonzero(ok)
    bsel, rsel = sb[gidx, pos], rank[gidx, pos]
    osel = order[gidx, pos]                   # back to unsorted key order
    planes = np.zeros((G, slots * nl, B // LANES, LANES), np.uint32)
    pview = planes.reshape(G, slots, nl, B)   # plane p = slot p//nl lane p%nl
    for ln, e in enumerate(entries):
        pview[gidx, rsel, ln, bsel] = e[gidx, osel]

    spills = []
    for g in range(G):
        spills.append(order[g][spilled[g]].astype(np.int64))
    return planes, spills


def spill_correction(keys: np.ndarray, counts: np.ndarray, spills) -> np.ndarray:
    """Exact (G, G) additive correction for spilled keys.

    With A = bucketed(A) ∪ spill(A) disjoint, the kernel counts
    |bA ∩ bB|; the remainder is
    corr[r,c] = |sA_r ∩ B_c| + |A_r ∩ sB_c| - |sA_r ∩ sB_c|
    (inclusion–exclusion over the disjoint splits) — the first two terms
    are transposes of one membership matrix M[r, c] = |spill(r) ∩ B_c|.

    Membership is a searchsorted over per-sketch sorted 64-bit mixes (one
    vectorized call per sketch for ALL spill keys at once); any mix hit is
    confirmed against the full 128-bit key, so 64-bit mix collisions cannot
    fake a match and equal-mix runs are scanned, so they cannot hide one.
    """
    G, cap = keys.shape[:2]
    corr = np.zeros((G, G), np.int64)
    n_spill = [len(s) for s in spills]
    if not any(n_spill):
        return corr
    lo, hi = _key_u64_parts(keys)
    z = mix64(mix64(lo) ^ hi)
    valid = np.arange(cap)[None, :] < np.asarray(counts)[:, None]
    zm = np.where(valid, z, np.uint64(0xFFFFFFFFFFFFFFFF))
    order = np.argsort(zm, axis=1, kind="stable")
    zs = np.take_along_axis(zm, order, 1)

    src = np.concatenate([np.full(n_spill[g], g, np.int64)
                          for g in range(G)])
    sidx = np.concatenate([np.asarray(spills[g], np.int64)
                           for g in range(G)])
    slo, shi, sz = lo[src, sidx], hi[src, sidx], z[src, sidx]

    member = np.zeros((len(src), G), bool)
    for c in range(G):
        nv = int(counts[c])
        left = np.searchsorted(zs[c, :nv], sz, side="left")
        right = np.searchsorted(zs[c, :nv], sz, side="right")
        hitw = np.nonzero(right > left)[0]
        for w in hitw:
            for p in range(left[w], right[w]):
                kr = order[c, p]
                if lo[c, kr] == slo[w] and hi[c, kr] == shi[w]:
                    member[w, c] = True
                    break
    m1 = np.zeros((G, G), np.int64)
    np.add.at(m1, src, member.astype(np.int64))
    corr += m1 + m1.T

    bykey = {}
    for w in range(len(src)):
        bykey.setdefault((int(slo[w]), int(shi[w])), []).append(int(src[w]))
    for who in bykey.values():
        for r in who:
            for c in who:
                corr[r, c] -= 1
    return corr
