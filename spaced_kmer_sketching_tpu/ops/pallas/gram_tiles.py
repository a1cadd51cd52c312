"""Fused VMEM tile scan for the packed (key, gid) Gram accumulation.

The XLA chunk scan (ops/gram._gram_chunks_packed) is HBM-bound: per stream
entry it materializes ~2.3 KB of one-hot traffic (the (B, C, gp) genome
indicator S, the (B, C, C) run-equality E and the (B, C, gp) product T are
all written to and re-read from HBM), which BASELINE_RESULTS.md's
speed-of-light accounting shows matches the measured 6.5-6.9 ms/tile at
the 819 GB/s HBM peak.  This kernel keeps every intermediate in VMEM so
HBM only carries the 4 B/entry meta stream plus the (r, c) accumulator.

An earlier fully-VMEM formulation (ops/pallas/gram_scan.py, retired in
round 4) was exact but ~60x SLOWER than the XLA scan: Mosaic lowers
per-chunk (128, 1) column-slice broadcasts (lane-dim slicing + lane
broadcast of a sublane vector) catastrophically.  This formulation is
built so NO column slice or lane-broadcast exists anywhere:

  * all data vectors (gid, rid, flags) stay in ROW layout (1, 128) /
    (sb, 128) — sublane slicing only, the cheap direction;
  * one-hots are built by comparing a row vector against a COLUMN iota
    (broadcasted_iota over the sublane dim — supported and cheap):
        S'_k (gp, 128)  = (iota_col == gid_row_k)    genome one-hot
        R'_k (128, 128) = (iota_col == rid_row_k)    run-id one-hot
  * instead of S^T E S, the chunk contribution uses per-run multi-hots:
        E_k = R'_k^T R'_k   =>   S_k^T E_k S_k = H_k^T H_k,
        H_k = (S'_k R'_k^T)^T      -- one MXU dot per chunk,
    and all H_k columns collect in a VMEM scratch so the whole step's
    contribution is ONE big K = sb*128 contraction (MXU-friendly);
  * every dot is an A @ B^T / A^T @ B dimension-number form (contract
    lane-with-lane or sublane-with-sublane), the patterns Mosaic lowers
    natively (same shapes as attention Q K^T).

Run-boundary corrections (a key run straddling chunk boundaries) follow
the exact cumulative open-run carry of the XLA scan: per chunk, a = the
multi-hot of its trailing run, b = the multi-hot of its leading run
(entries equal to the previous chunk's last key), P = the accumulated
open-run multi-hot, acc += sum_k P_k b_k^T (+ transpose) — here batched
as two (sb, gp) matrices contracted in one dot each, with only the cheap
(1, gp) row recurrence P <- a + cont * P running sequentially.

Since round 5 the kernel reads the pw packed planes DIRECTLY and derives
gid/boundary/eql/eqp flags in-kernel (lane/sublane rolls + triangular MXU
prefix/suffix matmuls, with a cross-step last-row key carry in VMEM) —
the separate XLA tile_meta pass is gone from the hot path (tile_meta
remains as the reference implementation for tests).

Exactness: every one-hot/multi-hot here is 0/1-valued (per-genome keys
are deduped, so a run holds at most one entry per gid), operands are
exact in int8/bf16, every matmul accumulates in int32/f32, and all
counts are < 2^24 — the output is bit-equal to _gram_chunks_packed
(tested in tests/test_gram_tiles_fused.py).

Parity anchor: this computes the same per-pair |A ∩ B| as the reference's
hash-probe intersection loop (src/kmer_set.cpp:23-41) over all pairs
(src/kmer_set.cpp:179); only the schedule is TPU-shaped.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .sort import LANES, _sds

# meta word layout (int32, one per stream entry)
GID_BITS = 11                      # gp < 2047; sentinel entries get all-ones
BND_BIT = GID_BITS                 # first entry of a key run (lane 0 counts)
EQL_BIT = BND_BIT + 1              # entry key == its chunk's LAST key
EQP_BIT = EQL_BIT + 1              # entry key == PREVIOUS chunk's last key
GID_SENT = (1 << GID_BITS) - 1     # one-hot row that never matches iota < gp

# one-hot/multi-hot element dtype (everything is 0/1-valued — see the
# per-chunk loop comment): int8 + int32 accumulation is the default
# (halves build stores and matmul operand bandwidth: 2.585 -> 2.289
# ms/tile measured r5 — unlike the XLA scan, where SKS_GRAM_MM=i8 was a
# wash because that path is bound by its HBM one-hot materialization,
# not operand bandwidth).  SKS_SCAN_ELEM=bf16 restores the f32/bf16
# variant for A/B.
import os as _os
_ELEM = (jnp.bfloat16 if _os.environ.get("SKS_SCAN_ELEM", "i8") == "bf16"
         else jnp.int8)
_ACC = jnp.int32 if _ELEM == jnp.int8 else jnp.float32


def tile_meta(sw, gidbits: int):
    """XLA precompute: pw sorted packed (key, gid) planes (n,) uint32
    (ops/gram._pack_gid_planes layout) -> (n/128, 128) int32 meta plane.

    Everything the scan kernel needs per entry fits in one word: the gid
    (sentinels forced to GID_SENT so their one-hot row vanishes), the
    run-BOUNDARY flag (equal keys are contiguous in the sorted stream;
    the kernel turns it into chunk-local run ids with one triangular MXU
    matmul — the XLA cumsum here was an 0.37 ms/tile reduce_window pass),
    and the eql/eqp boundary flags.  This is the only HBM traffic the
    kernel adds: ~4 B/entry written and re-read, vs the ~2.3 KB/entry the
    XLA scan materializes."""
    n = sw[0].shape[0]
    pw = len(sw)
    nch = n // LANES
    assert n % LANES == 0
    gmask = jnp.uint32((1 << gidbits) - 1)
    w = [x.reshape(nch, LANES) for x in sw]
    valid = (w[pw - 1] >> 31) == 0
    kf = [w[0] & ~gmask] + w[1:]
    gid = jnp.where(valid, (w[0] & gmask).astype(jnp.int32),
                    jnp.int32(GID_SENT))
    lane0 = lax.broadcasted_iota(jnp.int32, (nch, LANES), 1) == 0
    bnd = lane0
    for q in range(pw):
        prev = jnp.concatenate([kf[q][:, :1], kf[q][:, :-1]], axis=1)
        bnd = bnd | (kf[q] != prev)
    lk = [kf[q][:, -1:] for q in range(pw)]                    # (nch, 1)
    pk = [jnp.concatenate([jnp.full((1, 1), 0xFFFFFFFF, jnp.uint32),
                           l[:-1]], axis=0) for l in lk]
    eql = valid
    eqp = valid
    for q in range(pw):
        eql = eql & (kf[q] == lk[q])
        eqp = eqp & (kf[q] == pk[q])
    return (gid | (bnd.astype(jnp.int32) << BND_BIT)
            | (eql.astype(jnp.int32) << EQL_BIT)
            | (eqp.astype(jnp.int32) << EQP_BIT))


def _scan_kernel(sb: int, gp: int, r: int, c0: int, pw: int, gidbits: int,
                 *refs):
    plane_refs = refs[:pw]
    (out_ref, h_ref, sp_ref, ef_ref, amat_ref, bmat_ref, pmat_ref,
     pcar_ref, kcar_ref) = refs[pw:]
    s = pl.program_id(0)

    # the output block maps to (0, 0) at every grid step, so it stays
    # VMEM-resident for the whole grid and doubles as the accumulator —
    # a separate acc scratch would just duplicate its footprint (4 MB at
    # the gp=1024 ondevice gate)
    @pl.when(s == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)
        pcar_ref[:] = jnp.zeros_like(pcar_ref)
        kcar_ref[:] = jnp.full_like(kcar_ref, jnp.uint32(0xFFFFFFFF))

    # --- in-kernel meta: the XLA tile_meta pass (gid/bnd/eql/eqp packing)
    # cost ~0.3 ms/tile of unfused elementwise+pad passes per tile; here
    # the kernel reads the pw packed planes directly and derives the same
    # flags from TRUE global run boundaries (entry key != previous entry's
    # key, lane 0 looking at the previous row via a sublane roll and row 0
    # at the previous STEP's last row via the kcar carry):
    #   eqp[j] (key == previous chunk's last) <=> no true boundary in
    #           lanes [0..j] of the row        (inclusive prefix sum = 0)
    #   eql[j] (key == own chunk's last)      <=> no true boundary in
    #           lanes (j..127]                 (strict suffix sum = 0)
    #   rid[j] (chunk-local run id) = inclusive prefix of (bnd | lane0)
    #           minus 1 = the same inclusive prefix sum of true boundaries
    # and the prefix/suffix sums are two triangular MXU matmuls (0/1
    # operands, counts <= 128: exact in f32).
    gmask = jnp.uint32((1 << gidbits) - 1)
    w = [p[:] for p in plane_refs]                         # pw x (sb, 128)
    valid = (w[pw - 1] >> 31) == 0
    kf = [w[0] & ~gmask] + w[1:]
    iota_g = lax.broadcasted_iota(jnp.int32, (gp, LANES), 0)
    iota_r = lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
    iota_s = lax.broadcasted_iota(jnp.int32, (sb, LANES), 0)
    lane = lax.broadcasted_iota(jnp.int32, (sb, LANES), 1)
    row_i = lax.broadcasted_iota(jnp.int32, (sb, LANES), 0)

    bndx = jnp.zeros((sb, LANES), jnp.bool_)
    for q in range(pw):
        lr = pltpu.roll(kf[q], 1, 1)        # lane l <- l-1 (lane0 <- 127)
        sr = pltpu.roll(lr, 1, 0)           # row r <- r-1: lane0 now holds
        prev = jnp.where(lane == 0, sr, lr)  # the previous row's lane 127
        carry = pltpu.roll(kcar_ref[q:q + 1, :], 1, 1)   # lane0 <- [127]
        prev = jnp.where((lane == 0) & (row_i == 0), carry, prev)
        bndx = bndx | (kf[q] != prev)
    for q in range(pw):
        kcar_ref[q:q + 1, :] = kf[q][sb - 1:sb, :]

    bnd_bf = bndx.astype(jnp.bfloat16)
    tri_inc = (lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
               <= lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)) \
        .astype(jnp.bfloat16)
    tri_suf = (lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
               > lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)) \
        .astype(jnp.bfloat16)
    pinc = lax.dot_general(bnd_bf, tri_inc, (((1,), (0,)), ((), ())),
                           preferred_element_type=jnp.float32)
    psuf = lax.dot_general(bnd_bf, tri_suf, (((1,), (0,)), ((), ())),
                           preferred_element_type=jnp.float32)
    # chunk-LOCAL run ids restart at lane 0 whether or not the run truly
    # continues (the eqp/carry machinery accounts for the continuation),
    # so their prefix counts the forced lane-0 boundary too
    bnd_loc = (bndx | (lane == 0)).astype(jnp.bfloat16)
    rid_all = (lax.dot_general(bnd_loc, tri_inc, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32) - 1.0) \
        .astype(jnp.int32)                                 # (sb, 128)
    eqp_all = ((pinc == 0.0) & valid).astype(jnp.int32)
    eql_all = ((psuf == 0.0) & valid).astype(jnp.int32)
    gid_all = jnp.where(valid, (w[0] & gmask).astype(jnp.int32),
                        jnp.int32(GID_SENT))

    # per-chunk one-hots + per-run multi-hots; column block k of the h/sp
    # scratches belongs to chunk k (128-aligned lane slices).  Every one
    # of these matrices is 0/1-valued (per-genome keys are DEDUPED, so a
    # run holds at most one entry per gid: the run multi-hots are 0/1
    # too), so the elem dtype only affects store/load bandwidth and MXU
    # throughput, not exactness — _ELEM = int8 halves both vs bf16
    # (accumulation stays int32/f32: exact).
    for k in range(sb):
        gid = gid_all[k:k + 1, :]                          # (1, 128) i32
        rid = rid_all[k:k + 1, :]                          # (1, 128) i32
        spk = (iota_g == gid).astype(_ELEM)                # (gp, 128)
        rpk = (iota_r == rid).astype(_ELEM)                # (128, 128)
        sp_ref[:, k * LANES:(k + 1) * LANES] = spk
        # (Mosaic requires 32-bit matmul accumulators; 0/1 sums are exact
        # in f32/i32 and the narrow downcast of 0/1 results is lossless)
        h_ref[:, k * LANES:(k + 1) * LANES] = lax.dot_general(
            spk, rpk, (((1,), (1,)), ((), ())),
            preferred_element_type=_ACC).astype(_ELEM)
        # block-diagonal boundary-flag masks: column block k only keeps
        # sublane k, which already holds chunk k's flags — no lane
        # broadcasts, just a sublane-iota select.  eql rows and eqp rows
        # stack in ONE (2*sb, ·) scratch so a single contraction yields
        # both a and b (M=32 dots each wasted half the measured time)
        ef_ref[:sb, k * LANES:(k + 1) * LANES] = jnp.where(
            iota_s == k, eql_all, 0).astype(_ELEM)
        ef_ref[sb:, k * LANES:(k + 1) * LANES] = jnp.where(
            iota_s == k, eqp_all, 0).astype(_ELEM)

    # per-chunk trailing-run (a, rows [0, sb)) and leading-run (b, rows
    # [sb, 2sb)) multi-hots, all sb chunks in one K = sb*128 contraction
    ab2 = lax.dot_general(
        ef_ref[:], sp_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=_ACC).astype(jnp.float32)   # (2sb, gp)
    amat_ref[:] = ab2[:sb, :]
    bmat_ref[:] = ab2[sb:, :]

    # open-run carry recurrence P <- a + cont * P (cheap (1, gp) rows);
    # cont_k = eqp flag of chunk k's LAST entry (its last key equals the
    # previous chunk's last key <=> the whole chunk is one continuing run)
    cont_all = jnp.where(lane == LANES - 1, eqp_all, 0).astype(jnp.float32)
    p_cur = pcar_ref[:]                                    # (1, gp) f32
    for k in range(sb):
        pmat_ref[k:k + 1, :] = p_cur
        cont = jnp.sum(cont_all[k:k + 1, :])
        p_cur = amat_ref[k:k + 1, :] + cont * p_cur
    pcar_ref[:] = p_cur

    # main term: sum_k H_k^T H_k over the whole step in one contraction;
    # rows of h are gids, so the rect split is two sublane slices
    out_ref[:] += lax.dot_general(
        h_ref[:r, :], h_ref[c0:, :], (((1,), (1,)), ((), ())),
        preferred_element_type=_ACC).astype(jnp.float32) \
        + lax.dot_general(pmat_ref[:, :r], bmat_ref[:, c0:],
                          (((0,), (0,)), ((), ())),
                          preferred_element_type=jnp.float32) \
        + lax.dot_general(bmat_ref[:, :r], pmat_ref[:, c0:],
                          (((0,), (0,)), ((), ())),
                          preferred_element_type=jnp.float32)


def default_sb(gp: int) -> int:
    """Chunks per grid step: the h/sp scratches are (gp, sb*128) bf16 each,
    budgeted to ~2 MB apiece (VMEM is ~16 MB and the meta pipeline double
    buffers); bigger steps amortize grid overhead and lengthen the main
    contraction's K dim.  SKS_SCAN_SB overrides for A/B."""
    import os
    env = os.environ.get("SKS_SCAN_SB")
    if env:
        return int(env)
    return max(8, min(64, ((2 << 20) // (gp * LANES * 2)) // 8 * 8))


def gram_tile_scan_fused(sw, gidbits: int, gp: int, *,
                         split: int | None = None, sb: int | None = None,
                         interpret: bool = False):
    """Drop-in fused replacement for ops/gram._gram_chunks_packed at
    chunk=128: sw = pw sorted packed (key, gid) planes (n,) uint32 ->
    (r, c) f32 Gram accumulation (r = split or gp, c = gp - c0), bit-equal
    to the XLA scan.  gp, split must be multiples of 128 and gp < 2047.
    Under shard_map the out_shape's varying-manual-axes are derived from
    the stream itself (ops/pallas/sort._sds), so no caller plumbing is
    needed."""
    assert gp % LANES == 0 and 0 < gp < GID_SENT
    r = gp if split is None else split
    c0 = 0 if split is None else split
    assert r % LANES == 0 and c0 % LANES == 0
    if sb is None:
        sb = default_sb(gp)

    pw = len(sw)
    # accepts flat (n,) planes or (rows, 128) planes (no-op reshape for
    # the latter — gram_pair_tiles passes the merge output through)
    sw2 = [x.reshape(-1, LANES) for x in sw]
    nch = sw2[0].shape[0]
    assert sw[0].size % LANES == 0
    pad = -nch % sb
    if pad:
        fill = jnp.full((pad, LANES), 0xFFFFFFFF, jnp.uint32)
        sw2 = [jnp.concatenate([x, fill], axis=0) for x in sw2]
    nsteps = (nch + pad) // sb

    kern = functools.partial(_scan_kernel, sb, gp, r, c0, pw, gidbits)
    return pl.pallas_call(
        kern,
        grid=(nsteps,),
        in_specs=[pl.BlockSpec((sb, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] * pw,
        out_specs=pl.BlockSpec((r, gp - c0), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=_sds((r, gp - c0), jnp.float32, *sw2),
        scratch_shapes=[
            pltpu.VMEM((gp, sb * LANES), _ELEM),           # h
            pltpu.VMEM((gp, sb * LANES), _ELEM),           # sp
            pltpu.VMEM((2 * sb, sb * LANES), _ELEM),       # eql|eqp masks
            pltpu.VMEM((sb, gp), jnp.float32),             # amat
            pltpu.VMEM((sb, gp), jnp.float32),             # bmat
            pltpu.VMEM((sb, gp), jnp.float32),             # pmat
            pltpu.VMEM((1, gp), jnp.float32),              # p carry
            pltpu.VMEM((pw, LANES), jnp.uint32),           # last-row key carry
        ],
        interpret=interpret,
    )(*sw2)
