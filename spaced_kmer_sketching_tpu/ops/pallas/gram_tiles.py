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

Exactness: 0/1 operands are exact in bf16, every matmul accumulates in
f32, and all counts are < 2^24 — the output is bit-equal to
_gram_chunks_packed (tested in tests/test_gram_tiles_fused.py).

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


def _scan_kernel(sb: int, gp: int, r: int, c0: int,
                 meta_ref, out_ref, h_ref, sp_ref, ef_ref,
                 amat_ref, bmat_ref, pmat_ref, pcar_ref):
    s = pl.program_id(0)

    # the output block maps to (0, 0) at every grid step, so it stays
    # VMEM-resident for the whole grid and doubles as the accumulator —
    # a separate acc scratch would just duplicate its footprint (4 MB at
    # the gp=1024 ondevice gate)
    @pl.when(s == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)
        pcar_ref[:] = jnp.zeros_like(pcar_ref)

    meta = meta_ref[:]                                     # (sb, 128) i32
    eql_all = (meta >> EQL_BIT) & 1
    eqp_all = (meta >> EQP_BIT) & 1
    iota_g = lax.broadcasted_iota(jnp.int32, (gp, LANES), 0)
    iota_r = lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
    iota_s = lax.broadcasted_iota(jnp.int32, (sb, LANES), 0)
    lane = lax.broadcasted_iota(jnp.int32, (sb, LANES), 1)

    # chunk-local run ids from the boundary flags: an inclusive lane
    # prefix sum as ONE triangular matmul on the otherwise-idle MXU
    # (counts <= 128 are exact in f32; the XLA-side cumsum cost an
    # 0.37 ms/tile reduce_window HBM pass)
    bnd_all = ((meta >> BND_BIT) & 1).astype(jnp.bfloat16)
    tri = (lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
           <= lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)) \
        .astype(jnp.bfloat16)
    rid_all = (lax.dot_general(bnd_all, tri, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32) - 1.0) \
        .astype(jnp.int32)

    # per-chunk one-hots + per-run multi-hots; column block k of the h/sp
    # scratches belongs to chunk k (128-aligned lane slices)
    for k in range(sb):
        row = meta_ref[k:k + 1, :]                         # (1, 128) i32
        gid = row & GID_SENT
        rid = rid_all[k:k + 1, :]                          # (1, 128) i32
        spk = (iota_g == gid).astype(jnp.bfloat16)         # (gp, 128)
        rpk = (iota_r == rid).astype(jnp.bfloat16)         # (128, 128)
        sp_ref[:, k * LANES:(k + 1) * LANES] = spk
        # (Mosaic requires 32-bit matmul accumulators; 0/1 sums are exact
        # in f32 and the bf16 downcast of 0/1 results is lossless)
        h_ref[:, k * LANES:(k + 1) * LANES] = lax.dot_general(
            spk, rpk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        # block-diagonal boundary-flag masks: column block k only keeps
        # sublane k, which already holds chunk k's flags — no lane
        # broadcasts, just a sublane-iota select.  eql rows and eqp rows
        # stack in ONE (2*sb, ·) scratch so a single contraction yields
        # both a and b (M=32 dots each wasted half the measured time)
        ef_ref[:sb, k * LANES:(k + 1) * LANES] = jnp.where(
            iota_s == k, eql_all, 0).astype(jnp.bfloat16)
        ef_ref[sb:, k * LANES:(k + 1) * LANES] = jnp.where(
            iota_s == k, eqp_all, 0).astype(jnp.bfloat16)

    # per-chunk trailing-run (a, rows [0, sb)) and leading-run (b, rows
    # [sb, 2sb)) multi-hots, all sb chunks in one K = sb*128 contraction
    ab2 = lax.dot_general(
        ef_ref[:], sp_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                # (2sb, gp)
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
        preferred_element_type=jnp.float32) \
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
    contraction's K dim."""
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

    meta = tile_meta(sw, gidbits)                          # (nch, 128)
    nch = meta.shape[0]
    pad = -nch % sb
    if pad:
        meta = jnp.concatenate(
            [meta, jnp.full((pad, LANES), GID_SENT, jnp.int32)], axis=0)
    nsteps = (nch + pad) // sb

    kern = functools.partial(_scan_kernel, sb, gp, r, c0)
    return pl.pallas_call(
        kern,
        grid=(nsteps,),
        in_specs=[pl.BlockSpec((sb, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((r, gp - c0), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=_sds((r, gp - c0), jnp.float32, meta),
        scratch_shapes=[
            pltpu.VMEM((gp, sb * LANES), jnp.bfloat16),    # h
            pltpu.VMEM((gp, sb * LANES), jnp.bfloat16),    # sp
            pltpu.VMEM((2 * sb, sb * LANES), jnp.bfloat16),  # eql|eqp masks
            pltpu.VMEM((sb, gp), jnp.float32),             # amat
            pltpu.VMEM((sb, gp), jnp.float32),             # bmat
            pltpu.VMEM((sb, gp), jnp.float32),             # pmat
            pltpu.VMEM((1, gp), jnp.float32),              # p carry
        ],
        interpret=interpret,
    )(meta)
