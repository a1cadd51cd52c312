"""All-pairs sketch intersection as an MXU Gram matrix.

The reference computes |A ∩ B| per pair by probing a hash map
(src/kmer_set.cpp:23-41, driven all-pairs by the cilk_for at
kmer_set.cpp:179).  On TPU the FLOPs live in the MXU, so this module
reformulates the WHOLE G x G problem as one matrix product:

  - host: sort-dedup the union of all sketch keys once; every distinct
    128-bit key gets a global rank r < U,
  - each sketch g is then the 0/1 indicator column X[:, g] over ranks,
  - intersection counts = X^T X  -- exact, no hashing, no collisions.

X is shipped BIT-PACKED ((U, G/32) uint32, 1 bit per (key, genome) --
~n_union * G / 8 bytes) and a lax.scan unpacks one (T, G) tile at a time
with shifts/masks (no scatters, no gathers, both of which serialize on
this TPU) and accumulates X_t^T X_t on the MXU.  bfloat16 inputs are
exact for 0/1 values and the f32 accumulation is exact for counts < 2^24,
so the result is bit-exact against the reference hash-probe semantics;
self-pairs land on the diagonal as |A| (the reference's ordered all-pairs
includes them, src/generators.hpp:45-58).

Work: unpack ~ 3*U*G lane-ops (VPU), product 2*U*G^2 FLOPs (MXU at
~200 TFLOPs bf16) -- per-pair cost 2*U FLOPs, so throughput IMPROVES with
G at fixed union size, the opposite of the per-pair probe.  Memory is
O(U*G) bits; for collections too large for that, run this per macro-tile
of the blocked all-pairs schedule (parallel/allpairs.py) so U is the
union of one genome block pair.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

_WORD = 32


def build_rank_layout(keys: np.ndarray, counts: np.ndarray, *,
                      tile: int = 2048):
    """Host preprocessing: global ranks + bit-packed indicator matrix.

    keys: (G, cap, 4) uint32 sketch key lanes (sorted-unique per sketch,
    padding past counts ignored); counts: (G,) valid rows.

    Returns (packed, n_union): packed (n_tiles, tile, ceil(G/32)) uint32
    where bit g%32 of word [t, r, g//32] says genome g contains the key
    of global rank t*tile + r.  The rank order is any consistent total
    order over 128-bit keys -- only identity matters for intersection.
    """
    G, cap, _ = keys.shape
    counts = np.asarray(counts)
    valid_g, valid_p = np.nonzero(np.arange(cap)[None, :] < counts[:, None])
    kv = keys[valid_g, valid_p]                              # (N, 4) u32
    lo = kv[:, 0].astype(np.uint64) | (kv[:, 1].astype(np.uint64) << 32)
    hi = kv[:, 2].astype(np.uint64) | (kv[:, 3].astype(np.uint64) << 32)

    order = np.lexsort((lo, hi))
    ls, hs = lo[order], hi[order]
    first = np.ones(ls.size, bool)
    first[1:] = (ls[1:] != ls[:-1]) | (hs[1:] != hs[:-1])
    inv = np.empty(ls.size, np.int64)
    inv[order] = np.cumsum(first) - 1
    n_union = int(inv[order[-1]]) + 1 if ls.size else 0

    n_tiles = max(1, -(-n_union // tile))
    words = -(-G // _WORD)
    packed = np.zeros((n_tiles * tile * words,), np.uint32)
    if ls.size:
        # OR together bits sharing a (rank, word) cell without ufunc.at
        # (unbuffered .at is ~10 us/element): sort by flat address, then
        # one reduceat per address run
        addr = inv * words + valid_g // _WORD
        bitv = np.uint32(1) << (valid_g % _WORD).astype(np.uint32)
        o2 = np.argsort(addr, kind="stable")
        a_s, b_s = addr[o2], bitv[o2]
        run = np.ones(a_s.size, bool)
        run[1:] = a_s[1:] != a_s[:-1]
        starts = np.nonzero(run)[0]
        packed[a_s[starts]] = np.bitwise_or.reduceat(b_s, starts)
    return packed.reshape(n_tiles, tile, words), n_union


def gram_accumulate(packed, *, vary_axes=()):
    """(n_tiles, T, W) packed bits -> (32*W, 32*W) float32 partial Gram.

    Traceable building block: also used under shard_map with the tiles
    axis sharded over the mesh (parallel/allpairs.sharded_gram_fn), where
    per-device partials are psum-merged — all-zero padding tiles
    contribute nothing, so tile-count padding is free.  Under shard_map
    pass the mesh axis names as vary_axes so the scan carry matches the
    device-varying operand type."""
    nt, t, w = packed.shape
    bit = lax.broadcasted_iota(jnp.uint32, (1, 1, _WORD), 2)

    def body(acc, pk):
        bits = (pk[:, :, None] >> bit) & jnp.uint32(1)        # (T, W, 32)
        x = bits.reshape(t, w * _WORD).astype(jnp.bfloat16)
        return acc + jnp.dot(x.T, x, preferred_element_type=jnp.float32), None

    acc0 = jnp.zeros((w * _WORD, w * _WORD), jnp.float32)
    if vary_axes:
        acc0 = lax.pcast(acc0, tuple(vary_axes), to="varying")
    acc, _ = lax.scan(body, acc0, packed)
    return acc


@jax.jit
def gram_intersections_device(packed):
    """(n_tiles, T, W) packed bits -> exact (32*W, 32*W) int32 matrix."""
    return gram_accumulate(packed).astype(jnp.int32)


def gram_all_pairs(keys, counts, *, tile: int = 2048) -> np.ndarray:
    """Exact (G, G) int64 all-pairs intersection matrix (host entry)."""
    keys = np.asarray(keys)
    g = keys.shape[0]
    packed, _ = build_rank_layout(keys, np.asarray(counts), tile=tile)
    out = gram_intersections_device(jnp.asarray(packed))
    return np.asarray(out)[:g, :g].astype(np.int64)
