"""Pallas TPU kernel: per-row candidate compaction for the sketch finish.

The fused extract kernel (ops/pallas/extract.py) emits per-row candidate
slots that are mostly sentinel fill (FracMinHash keeps ~1/scale of windows,
src/kmer-sketching.cpp:29-34).  Sorting that sparse array dominated the
sketch step in round 1 (the per-run bitonic sort burned ~2.7 ms of a 9 ms
step sorting sentinels).  This kernel shrinks the candidate array instead:
reshape to (R, 128) rows and compact each row's valid slots to its first
k_out lanes (lane cumsum + one-hot reduction, same trick as the extract
kernel's epilogue), repeating until the array is within the sketch
capacity — a tree compaction that replaces ~log2(n) bitonic rounds over the
full sparse array with 2-3 cheap passes over rapidly-shrinking data.

Validity is carried by the keys themselves: a slot is valid iff it is not
the all-ones sentinel.  A canonical masked key can NEVER be all-ones — the
canonical key is min(masked_fw, masked_rc) (src/kmer_sliding.cpp:164-175),
and all-ones requires BOTH strands all-ones under the mask, i.e. the window
all-T (forward) and all-A (reverse-complement) at care positions
simultaneously — impossible.  Rows that overflow k_out drop keys; callers
detect this exactly via valid-count bookkeeping and retry at a larger
capacity (ops/sketch._finish_tree).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .extract import _lane_cumsum

from .sort import _sds



KEY_WORDS = 4
LANES = 128
SENT = 0xFFFFFFFF


def _butterfly_compact_lanes(ws, valid):
    """Move each row's valid lanes to the front, preserving order: butterfly
    routing LSB->MSB over the per-lane move distance d = lane - (rank-1).
    Monotone routes (d is non-decreasing over valid lanes) are collision-free
    through the binary-shift network.  Returns (planes, rowcnt (R,1))."""
    from jax.experimental.pallas import tpu as pltpu

    cum = _lane_cumsum(valid.astype(jnp.int32))    # (R, 128) 1-based ranks
    lane = jax.lax.broadcasted_iota(jnp.int32, valid.shape, 1)
    # D packs the distance (bits 0..6) and the valid flag (bit 30)
    dist = lane - (cum - 1)
    d = jnp.where(valid, dist | (1 << 30), 0)
    planes = [pltpu.bitcast(w, jnp.int32) for w in ws]
    for b in range(7):
        s = 1 << b
        d_src = pltpu.roll(d, 128 - s, 1)          # lane l <- lane l+s
        incoming = ((d_src >> 30) & 1 != 0) & ((d_src >> b) & 1 != 0)
        # roll wrap-around is safe: d <= lane always (rank >= 1, and moves
        # decrement lane and d together), so a wrapped source at lane
        # l+s-128 < s has d < s, i.e. bit b clear -> never routed.
        leaving = ((d >> 30) & 1 != 0) & ((d >> b) & 1 != 0)
        planes = [jnp.where(incoming, pltpu.roll(p, 128 - s, 1), p)
                  for p in planes]
        d = jnp.where(incoming, d_src - s, jnp.where(leaving, 0, d))
    rowcnt = jnp.max(cum, axis=1, keepdims=True)
    out = [pltpu.bitcast(p, jnp.uint32) for p in planes]
    return out, rowcnt


def _compact_rows_kernel(*refs, nplanes: int, k_out: int,
                         with_counts: bool = False):
    ins = refs[:nplanes]
    outs = refs[nplanes:2 * nplanes]
    ws = [w[0] for w in ins]                       # (Rt, 128) uint32
    s = jnp.uint32(SENT)
    valid = ws[0] != s
    for w in ws[1:]:
        valid = valid | (w != s)
    packed, rowcnt = _butterfly_compact_lanes(ws, valid)
    rows = ws[0].shape[0]
    svalid = jax.lax.broadcasted_iota(jnp.int32, (rows, k_out), 1) < rowcnt
    for q, o in enumerate(outs):
        o[0] = jnp.where(svalid, packed[q][:, :k_out], jnp.uint32(SENT))
    if with_counts:
        # valid slots actually present in THIS row's output (excess past
        # k_out dropped) — lets callers do exact drop detection from a
        # tiny (G, R) plane instead of sweeping the whole output
        refs[-1][0] = jnp.minimum(rowcnt, k_out).astype(jnp.int32)


def _row_prefix_excl(row_tot):
    """Exclusive prefix sum over the row axis of an (R, 1) int32 column —
    Hillis-Steele with sublane rolls."""
    from jax.experimental.pallas import tpu as pltpu

    r = row_tot.shape[0]
    incl = row_tot
    rows = jax.lax.broadcasted_iota(jnp.int32, (r, 1), 0)
    sh = 1
    while sh < r:
        shifted = pltpu.roll(incl, sh, 0)
        incl = incl + jnp.where(rows >= sh, shifted, 0)
        sh *= 2
    return incl - row_tot


def _compact_global_kernel(*refs, nplanes: int):
    """Order-preserving compaction of the WHOLE (R, 128) tile (row-major
    flat order): valid lanes move to the global front.  Butterfly routing
    over the flat move distance, LSB->MSB; sub-row shifts via the
    lane/row-roll compose (see extract._slide), whole-row shifts via
    sublane rolls.  Replaces sentinel+re-sort recompaction (a full bitonic
    over `capacity`) after adjacent-unique marking: the survivors are
    already in sorted order, only the holes must close."""
    from jax.experimental.pallas import tpu as pltpu

    from .extract import _slide

    ins, outs = refs[:nplanes], refs[nplanes:]
    ws = [w[0] for w in ins]                       # (R, 128) uint32
    r = ws[0].shape[0]
    n = r * LANES
    s_ = jnp.uint32(SENT)
    valid = ws[0] != s_
    for w in ws[1:]:
        valid = valid | (w != s_)
    cum_l = _lane_cumsum(valid.astype(jnp.int32))
    row_tot = jnp.max(cum_l, axis=1, keepdims=True)
    cum = cum_l + _row_prefix_excl(row_tot)        # global 1-based ranks
    total = jnp.max(cum)
    lane = jax.lax.broadcasted_iota(jnp.int32, (r, LANES), 1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (r, LANES), 0)
    flat = rows * LANES + lane
    d = jnp.where(valid, (flat - (cum - 1)) | (1 << 30), 0)
    planes = [pltpu.bitcast(w, jnp.int32) for w in ws]
    b = 0
    while (1 << b) < n:
        s = 1 << b
        if s < LANES:
            d_src = _slide(d, s)
            shift = lambda p: _slide(p, s)
        else:
            d_src = pltpu.roll(d, r - s // LANES, 0)
            shift = lambda p: pltpu.roll(p, r - s // LANES, 0)
        # wrapped sources have flat index < s hence d < s: bit b clear,
        # never routed (same invariant as the per-row butterfly)
        incoming = ((d_src >> 30) & 1 != 0) & ((d_src >> b) & 1 != 0)
        leaving = ((d >> 30) & 1 != 0) & ((d >> b) & 1 != 0)
        planes = [jnp.where(incoming, shift(p), p) for p in planes]
        d = jnp.where(incoming, d_src - s, jnp.where(leaving, 0, d))
        b += 1
    keep = flat < total
    for q, o in enumerate(outs):
        o[0] = jnp.where(keep, pltpu.bitcast(planes[q], jnp.uint32), s_)


COMPACT_GLOBAL_MAX_ROWS = 1024    # whole-array VMEM block beyond this OOMs
                                  # scoped vmem (measured: 4096 rows wants
                                  # 44.6M against the 16M limit)


def _compact_global_xla(words):
    """XLA fallback for capacities whose (R, 128) block exceeds scoped
    VMEM: the same order-preserving LSB->MSB butterfly as
    _compact_global_kernel, expressed as G-batched elementwise rolls over
    the flat axis (rolls/selects only — no sort, no gather)."""
    from jax import lax

    g, n = words[0].shape
    s_ = jnp.uint32(SENT)
    valid = words[0] != s_
    for w in words[1:]:
        valid = valid | (w != s_)
    cum = jnp.cumsum(valid.astype(jnp.int32), axis=1)     # 1-based ranks
    total = cum[:, -1:]
    flat = lax.broadcasted_iota(jnp.int32, (g, n), 1)
    d = jnp.where(valid, (flat - (cum - 1)) | (1 << 30), 0)
    planes = list(words)
    b = 0
    while (1 << b) < n:
        s = 1 << b
        d_src = jnp.roll(d, -s, axis=1)
        # wrapped sources have flat index < s hence d < s: bit b clear,
        # never routed (same invariant as the kernel butterfly)
        incoming = ((d_src >> 30) & 1 != 0) & ((d_src >> b) & 1 != 0)
        leaving = ((d >> 30) & 1 != 0) & ((d >> b) & 1 != 0)
        planes = [jnp.where(incoming, jnp.roll(p, -s, axis=1), p)
                  for p in planes]
        d = jnp.where(incoming, d_src - s, jnp.where(leaving, 0, d))
        b += 1
    return [jnp.where(flat < total, p, s_) for p in planes]


def compact_global(words, *, interpret: bool = False):
    """words: list of (G, n) uint32 sentinel-holed planes (4 for full
    128-bit keys, fewer when the window geometry bounds the key), n = R*128
    a power of two -> same shapes with all valid entries moved to the front
    in original order, sentinel tail."""
    g, n = words[0].shape
    np_ = len(words)
    assert n % LANES == 0 and n & (n - 1) == 0
    r = n // LANES
    if r > COMPACT_GLOBAL_MAX_ROWS:
        return _compact_global_xla(words)
    outs = pl.pallas_call(
        functools.partial(_compact_global_kernel, nplanes=np_),
        grid=(g,),
        in_specs=[pl.BlockSpec((1, r, LANES), lambda gi: (gi, 0, 0))] * np_,
        out_specs=[pl.BlockSpec((1, r, LANES), lambda gi: (gi, 0, 0))] * np_,
        out_shape=[_sds((g, r, LANES), jnp.uint32, words[0])] * np_,
        interpret=interpret,
    )(*[w.reshape(g, r, LANES) for w in words])
    return [o.reshape(g, n) for o in outs]


def compact_rows(words, k_out: int, *, interpret: bool = False,
                 with_counts: bool = False):
    """words: list of (G, R, 128) uint32 sentinel-padded candidate planes
    -> same-length list of (G, R, k_out): each row's valid slots moved to
    the front (original order), all-ones fill.  Rows with more than k_out
    valid slots drop the excess — callers must detect via valid-count
    conservation.  with_counts=True additionally returns a (G, R) int32
    plane of per-row OUTPUT valid counts (min(valid, k_out)) so the
    detection needs no sweep over the output."""
    g, r, lanes = words[0].shape
    np_ = len(words)
    assert lanes == LANES
    rt = min(r, 256)                       # rows per grid step
    while r % rt:
        rt //= 2
    kern = functools.partial(_compact_rows_kernel, nplanes=np_, k_out=k_out,
                             with_counts=with_counts)
    out_specs = [pl.BlockSpec((1, rt, k_out),
                              lambda gi, t: (gi, t, 0))] * np_
    out_shape = [_sds((g, r, k_out), jnp.uint32, words[0])] * np_
    if with_counts:
        out_specs = out_specs + [pl.BlockSpec((1, rt, 1),
                                              lambda gi, t: (gi, t, 0))]
        out_shape = out_shape + [_sds((g, r, 1), jnp.int32, words[0])]
    outs = pl.pallas_call(
        kern,
        grid=(g, r // rt),
        in_specs=[pl.BlockSpec((1, rt, LANES),
                               lambda gi, t: (gi, t, 0))] * np_,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*words)
    if with_counts:
        return list(outs[:np_]), outs[np_].reshape(g, r)
    return list(outs)
