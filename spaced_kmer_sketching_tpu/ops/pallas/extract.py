"""Fused Pallas TPU kernel: spaced-seed window extraction + FracMinHash.

Replaces the jnp formulation in ops/extract.py + the hash/filter step for
the hot path: one kernel reads a block of 2-bit codes from HBM once, builds
both strand windows, masks, canonicalizes, hashes (boost-compatible 64-bit
arithmetic over u32 lane pairs) and emits (canonical key lanes, keep flag)
— where XLA materialized ~7 separate fusions with HBM round-trips between
them (src of the semantics: src/kmer_sliding.cpp:112-186 + kmer.hpp:135-149
via ops/extract.py, ops/u64ops.py; bit-exact by the same formulas).

Layout: everything is (rows, 128) with the window index flattened row-major.
The sliding access codes[t + j] is implemented as a lane-roll + row-roll
compose (`_slide`) — unaligned 1-D VMEM slices silently miscompile on this
Mosaic version (verified on hardware: interpret mode exact, compiled output
wrong at every position), while rolls of aligned tiles are exact.

Grid: one program per block of B windows.  Blocks overlap by (window - 1)
codes (the halo that makes blocks independent — the same overlap-and-discard
trick the sequence-parallel layer uses across chips), which BlockSpec can't
express, so codes/run_id stay in ANY memory and each program DMAs its tile
rows into VMEM scratch.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import u64ops

KEY_WORDS = 4
LANES = 128
BLOCK = 32768                     # windows per grid step (large: amortizes
                                  # the per-block HBM->VMEM DMA latency)
BROWS = BLOCK // LANES            # 32
HALO_ROWS = BROWS + 8             # extra 1024 codes cover window-1 <= 63
MAX_SHIFT = LANES                 # _slide supports 0 <= j < 128


def _slide(x, j: int):
    """y flattened[i] = x flattened[i + j] for (R, 128) row-major x,
    0 <= j < 128.  Elements wrapped from the array end land only in the
    final rows, which callers never read (halo rows)."""
    if j == 0:
        return x
    rows = x.shape[0]
    a = pltpu.roll(x, LANES - j, 1)            # a[r, l] = x[r, (l+j) % 128]
    b = pltpu.roll(a, rows - 1, 0)             # b[r, l] = a[r+1 mod R, l]
    lane = lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lane < LANES - j, a, b)


def _kernel(codes_hbm, rid_hbm, mask_ref, o0, o1, o2, o3, okeep,
            codes_s, rid_s, sems, *, window: int, salt: int, scale: int,
            variant: str):
    g = pl.program_id(0)            # genome (batch) index
    b = pl.program_id(1)            # window-block index
    row0 = pl.multiple_of(b * BROWS, BROWS)
    cp_c = pltpu.make_async_copy(codes_hbm.at[g, pl.ds(row0, HALO_ROWS)],
                                 codes_s, sems.at[0])
    cp_r = pltpu.make_async_copy(rid_hbm.at[g, pl.ds(row0, HALO_ROWS)],
                                 rid_s, sems.at[1])
    cp_c.start()
    cp_r.start()
    cp_c.wait()
    cp_r.wait()

    codes = codes_s[:]
    fw = [jnp.zeros((HALO_ROWS, LANES), jnp.uint32) for _ in range(KEY_WORDS)]
    rw = [jnp.zeros((HALO_ROWS, LANES), jnp.uint32) for _ in range(KEY_WORDS)]
    for j in range(window):
        q, r = divmod(2 * j, 32)
        cf = _slide(codes, window - 1 - j)
        cr = jnp.asarray(3, jnp.uint32) - _slide(codes, j)
        fw[q] = fw[q] | (cf << r)
        rw[q] = rw[q] | (cr << r)

    mf = [fw[q] & mask_ref[0, q] for q in range(KEY_WORDS)]
    mr = [rw[q] & mask_ref[0, q] for q in range(KEY_WORDS)]
    fwd_lt = mf[0] < mr[0]
    for q in range(1, KEY_WORDS):
        fwd_lt = (mf[q] < mr[q]) | ((mf[q] == mr[q]) & fwd_lt)
    canon = [jnp.where(fwd_lt, mf[q], mr[q])[:BROWS] for q in range(KEY_WORDS)]

    rid = rid_s[:]
    rid_a = rid[:BROWS]
    rid_b = _slide(rid, window - 1)[:BROWS]
    valid = (rid_a == rid_b) & (rid_a >= 0)
    keep = valid & u64ops.fmh_keep(*canon, salt=salt, scale=scale,
                                   variant=variant)
    o0[0], o1[0], o2[0], o3[0] = canon
    okeep[0] = keep.astype(jnp.uint32)


@functools.partial(jax.jit,
                   static_argnames=("window", "salt", "scale", "variant",
                                    "interpret"))
def extract_filter_windows_batched(codes, run_id, mask_words, *, window: int,
                                   salt: int, scale: int, variant: str,
                                   interpret: bool = False):
    """codes/run_id (G, n): returns (canon 4x(G, nw), keep (G, nw) bool),
    nw = n - window + 1 — the genome batch rides a grid dimension (vmap over
    ANY-memory pallas inputs is unsupported on TPU, so batching is native).
    Semantics identical per genome to ops/extract.extract_windows +
    u64ops.fmh_keep."""
    assert window <= 64, "window exceeds MAX_KMER_LENGTH"
    g, n = codes.shape
    nw = n - window + 1
    nwp = ((nw + BLOCK - 1) // BLOCK) * BLOCK
    need = nwp + HALO_ROWS * LANES - BLOCK    # last block reads HALO_ROWS rows
    pad = need - n
    if pad > 0:
        codes = jnp.concatenate(
            [codes, jnp.zeros((g, pad), codes.dtype)], axis=1)
        run_id = jnp.concatenate(
            [run_id, jnp.full((g, pad), -1, run_id.dtype)], axis=1)
    codes2 = codes.astype(jnp.uint32).reshape(g, -1, LANES)
    rid2 = run_id.reshape(g, -1, LANES)

    kern = functools.partial(_kernel, window=window, salt=salt, scale=scale,
                             variant=variant)
    outs = pl.pallas_call(
        kern,
        grid=(g, nwp // BLOCK),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((1, KEY_WORDS), lambda gi, b: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[pl.BlockSpec((1, BROWS, LANES), lambda gi, b: (gi, b, 0),
                                memory_space=pltpu.VMEM)] * 5,
        out_shape=[jax.ShapeDtypeStruct((g, nwp // LANES, LANES),
                                        jnp.uint32)] * 5,
        scratch_shapes=[
            pltpu.VMEM((HALO_ROWS, LANES), jnp.uint32),
            pltpu.VMEM((HALO_ROWS, LANES), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(codes2, rid2, mask_words.reshape(1, KEY_WORDS))
    canon = tuple(o.reshape(g, nwp)[:, :nw] for o in outs[:4])
    keep = outs[4].reshape(g, nwp)[:, :nw] != 0
    return canon, keep


def extract_filter_windows(codes, run_id, mask_words, *, window: int,
                           salt: int, scale: int, variant: str,
                           interpret: bool = False):
    """Single-genome wrapper: codes/run_id (n,) -> (canon 4x(nw,), keep)."""
    canon, keep = extract_filter_windows_batched(
        codes[None], run_id[None], mask_words, window=window, salt=salt,
        scale=scale, variant=variant, interpret=interpret)
    return tuple(c[0] for c in canon), keep[0]
