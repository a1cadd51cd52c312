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


# --- fully device-side variant -------------------------------------------
#
# build_rank_layout is host NumPy: it downloads every sketch, pays this
# sandbox's first-touch page faults (~1-11 s per build, utils/hostmem.py),
# and re-uploads the packed matrix.  The device formulation never leaves
# the chip: the G sorted sketches (already on device, the sketch step's
# output) are merge-sorted into one global (key, genome) order with the
# genome id riding along the Pallas bitonic merges, then scanned in
# C-entry chunks where each chunk contributes S^T E S to the Gram matrix:
#   S (C, G)  = one-hot genome indicators (0 for sentinel rows),
#   E (C, C)  = key-equality indicator (equal keys are contiguous after
#               the sort, but E needs no rank bookkeeping at all),
# so intersections accumulate as two MXU matmuls per chunk — 0/1 values
# are exact in bfloat16 and counts < 2^24 are exact in the f32
# accumulator.  A key whose run straddles a chunk boundary contributes
# a^T a + b^T b instead of (a+b)^T (a+b); the scan carries the previous
# chunk's last key and its genome vector `a` and adds the missing
# a b^T + b a^T (a run can span at most one boundary when C >= G, since a
# key appears at most once per sketch).


def _gram_from_sorted_chunks(sw, sg, g: int, gp: int, chunk: int,
                             binner: int = 32):
    """sw: 4 x (N,) sorted key words; sg: (N,) genome ids (int32).
    Returns (gp, gp) f32 Gram accumulated over N/chunk chunks.

    `binner` chunks are processed per scan step as one batched E·S
    dot_general plus a single flattened S^T·T product — a per-chunk scan
    spent most of its time in per-iteration overhead and tiny matmuls.
    Boundary corrections between consecutive chunks (a key run straddling
    a boundary contributes a^T a + b^T b instead of (a+b)^T (a+b)) are
    vectorized across the batch: pa_all[b] = a[b-1] with the scan carry
    supplying chunk -1, and the missing Σ_b (pa_b b_b^T + b_b pa_b^T) is
    two rank-B outer-product matmuls."""
    n = sw[0].shape[0]
    kw = len(sw)                       # active key words (<= 4)
    nchunks = n // chunk
    binner = max(1, min(binner, nchunks))
    while nchunks % binner:
        binner -= 1
    outer = nchunks // binner
    xs = [w.reshape(outer, binner, chunk) for w in sw] + [
        sg.reshape(outer, binner, chunk)]

    sent = jnp.uint32(0xFFFFFFFF)
    gids = jnp.arange(gp, dtype=jnp.int32)

    def body(carry, x):
        acc, pk, pa = carry            # pk: kw x () u32, pa: (Gp,) f32
        w = x[:kw]                     # each (B, C)
        gid = x[kw].astype(jnp.int32)
        valid = w[0] != sent
        for q in range(1, kw):
            valid = valid | (w[q] != sent)
        # S: one-hot genome rows, zeroed for sentinel entries   (B, C, Gp)
        s = ((gid[:, :, None] == gids[None, None, :]) & valid[:, :, None]) \
            .astype(jnp.bfloat16)
        # E: key-equality indicator within each chunk           (B, C, C)
        eq = jnp.ones((binner, chunk, chunk), jnp.bool_)
        for q in range(kw):
            eq = eq & (w[q][:, :, None] == w[q][:, None, :])
        e = eq.astype(jnp.bfloat16)
        # T[b,c,g] = does genome g hold key_{b,c} in chunk b — 0/1, so
        # bf16-exact for the second product
        t = lax.dot_general(e, s, (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
        acc = acc + jnp.dot(s.reshape(binner * chunk, gp).T,
                            t.reshape(binner * chunk, gp)
                            .astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)
        # per-chunk last key + its genome vector a              (B, Gp)
        lk = [w[q][:, -1] for q in range(kw)]
        eql = valid
        for q in range(kw):
            eql = eql & (w[q] == lk[q][:, None])
        a = jnp.einsum("bc,bcg->bg", eql.astype(jnp.float32),
                       s.astype(jnp.float32))
        # previous-chunk key/vector per chunk (carry fills chunk -1)
        pk_all = [jnp.concatenate([pk[q][None], lk[q][:-1]])
                  for q in range(kw)]
        pa_all = jnp.concatenate([pa[None], a[:-1]], axis=0)   # (B, Gp)
        eqp = valid
        for q in range(kw):
            eqp = eqp & (w[q] == pk_all[q][:, None])
        b = jnp.einsum("bc,bcg->bg", eqp.astype(jnp.float32),
                       s.astype(jnp.float32))                  # (B, Gp)
        corr = jnp.dot(pa_all.T, b)                            # (Gp, Gp)
        acc = acc + corr + corr.T
        return (acc, [lk[q][-1] for q in range(kw)], a[-1]), None

    acc0 = jnp.zeros((gp, gp), jnp.float32)
    pk0 = [jnp.full((), 0xFFFFFFFF, jnp.uint32) for _ in range(kw)]
    pa0 = jnp.zeros((gp,), jnp.float32)
    (acc, _, _), _ = lax.scan(body, (acc0, pk0, pa0), xs)
    return acc


def key_words_for_window(window: int) -> int:
    """Number of uint32 key words that can be nonzero for masked canonical
    keys of `window` nucleotides, PLUS a sentinel guard bit: valid keys
    have bit positions < 2*window (spaced-seed masks only set bits there,
    utils/masks.py), so the word holding bit 2*window is zero for every
    valid key and all-ones for the sentinel.  Capped at 4; at window=64
    the guard does not exist and the documented all-ones/poly-T sentinel
    collision edge case of the 4-word layout applies unchanged."""
    return min(4, 2 * window // 32 + 1)


@functools.partial(jax.jit, static_argnames=("chunk", "key_words",
                                             "interpret"))
def gram_rect_ondevice(keys_r, counts_r, keys_c, counts_c, *,
                       chunk: int | None = None, key_words: int = 4,
                       interpret: bool = False):
    """One-dispatch macro-tile for the blocked all-pairs schedule: stacks
    the row and column blocks ON DEVICE and returns the full
    (R+C, R+C) on-device Gram — callers slice [:R, R:] for the rect tile
    and its transpose for the mirror (host-side concatenation re-uploaded
    both blocks per tile and the eager concat added dispatch round-trips;
    the tunnel charges ~17 ms per dispatch)."""
    keys = jnp.concatenate([keys_r, keys_c])
    counts = jnp.concatenate([counts_r, counts_c])
    return gram_all_pairs_ondevice(keys, counts, chunk=chunk,
                                   key_words=key_words, interpret=interpret)


@functools.partial(jax.jit, static_argnames=("chunk", "key_words",
                                             "interpret"))
def gram_all_pairs_ondevice(keys, counts, *, chunk: int | None = None,
                            key_words: int = 4, interpret: bool = False):
    """Exact (G, G) int32 all-pairs intersection matrix, computed without
    any host round-trip: keys (G, cap, W) uint32 device sketches (sorted
    unique, sentinel padded — SketchBatch.keys layout; W >= key_words, so
    callers may upload only the low key-word planes), counts (G,).

    Requires chunk >= G (one key contributes at most G entries, so a run
    spans at most one chunk boundary) and a multiple of LANES; the default
    picks the smallest legal chunk — the E-matrix work is O(N * chunk), so
    smaller is strictly cheaper.  Pads genomes to gp = ceil128(G) for the
    MXU.

    key_words: how many low uint32 words the sort/scan must carry —
    callers that know the window pass key_words_for_window(window) (words
    above bit 2*window are zero for every valid key, and the guard bit
    keeps the sentinel distinguishable), cutting merge-sort traffic and
    comparator work by up to 40%."""
    from .pallas.sort import LANES, merge_sorted_runs

    g, cap, _ = keys.shape
    kw = key_words
    if chunk is None:
        chunk = max(LANES, -(-g // LANES) * LANES)
    assert chunk >= g, "chunk must be >= G (one entry per key per sketch)"
    assert chunk % LANES == 0
    gp = max(LANES, -(-g // LANES) * LANES)

    # the merge tree wants a power-of-two run count: pad with all-sentinel
    # pseudo-sketches (they sort to the back and their S rows are zero)
    g2 = 1 << max(0, (g - 1).bit_length())
    if g2 != g:
        pad = jnp.full((g2 - g, cap, keys.shape[2]), 0xFFFFFFFF, jnp.uint32)
        keys = jnp.concatenate([keys, pad], axis=0)
    n = g2 * cap

    gid = jnp.broadcast_to(jnp.arange(g2, dtype=jnp.uint32)[:, None],
                           (g2, cap))
    planes = [keys[:, :, q].reshape(n // LANES, LANES) for q in range(kw)]
    planes.append(gid.reshape(n // LANES, LANES))

    run_rows = cap // LANES
    if jax.default_backend() != "tpu" and not interpret:
        # XLA fallback: one lax.sort (non-TPU backends)
        flat = [p.reshape(n) for p in planes]
        srt = lax.sort(tuple(flat[:kw][::-1]) + (flat[kw],), num_keys=kw)
        sw = list(srt[:kw][::-1])
        sg = srt[kw]
    else:
        merged = merge_sorted_runs(planes, run_rows, interpret=interpret,
                                   nkeys=kw)
        sw = [p.reshape(n) for p in merged[:kw]]
        sg = merged[kw].reshape(n)

    npad = -n % chunk
    if npad:
        sw = [jnp.concatenate([w, jnp.full((npad,), 0xFFFFFFFF, jnp.uint32)])
              for w in sw]
        sg = jnp.concatenate([sg, jnp.zeros((npad,), jnp.uint32)])
    acc = _gram_from_sorted_chunks(sw, sg.astype(jnp.int32), g, gp, chunk)
    return acc[:g, :g].astype(jnp.int32)
