"""Pallas TPU all-pairs sketch intersection over bucketized layouts.

Replaces the XLA binary-search probe (ops/intersect.py) for the G x G ANI
matrix (reference hot loop: src/kmer_set.cpp:23-41 probed per pair under a
cilk_for at kmer_set.cpp:179).  Gathers serialize on this TPU; this kernel
does NONE — sketches arrive pre-bucketized (ops/bucketized.py) so a pair's
intersection is S*S slot-plane equality compares over aligned (B/128, 128)
vectors plus one reduction:

  count(r, c) = Σ_{i,j∈slots} Σ_b all-lanes-equal(A[r,i,b], B[c,j,b])

Keys can only collide inside their own bucket (bucket = top bits of an
invertible mix), empty slots hold zeros, and the column side's last lane is
OR'ed with (lane == 0) so sentinels never match anything (see
ops/bucketized.py for the entry encoding).

Grid = (G/R, G/C, C): the R-row block stays resident in VMEM for a whole
row of the matrix, one column sketch streams in per step, and the (R, 128)
output block accumulates across the C minor steps (lane c = local column).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .sort import _sds

LANES = 128


def _bucket_kernel(r_blk: int, c_blk: int, slots: int, nl: int,
                   a_ref, b_ref, o_ref):
    c = pl.program_id(2)

    @pl.when(c == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    # column-side planes, last lane sentinel-shifted (0 -> 1; real entries
    # have the tag bit set and are unchanged)
    bvals = []
    for j in range(slots):
        lanes = [b_ref[0, j * nl + ln] for ln in range(nl)]
        lanes[-1] = lanes[-1] | (lanes[-1] == 0).astype(jnp.uint32)
        bvals.append(lanes)

    row_iota = lax.broadcasted_iota(jnp.int32, (r_blk, LANES), 0)
    lane_iota = lax.broadcasted_iota(jnp.int32, (r_blk, LANES), 1)
    out_acc = jnp.zeros((r_blk, LANES), jnp.int32)
    for r in range(r_blk):
        acc = None
        for i in range(slots):
            alanes = [a_ref[r, i * nl + ln] for ln in range(nl)]
            for j in range(slots):
                eq = alanes[0] == bvals[j][0]
                for ln in range(1, nl):
                    eq = eq & (alanes[ln] == bvals[j][ln])
                hit = eq.astype(jnp.int32)
                acc = hit if acc is None else acc + hit
        s = jnp.sum(acc)
        out_acc = out_acc + jnp.where((row_iota == r) & (lane_iota == c),
                                      s, 0)
    o_ref[:] = o_ref[:] + out_acc


@functools.partial(jax.jit, static_argnames=("slots", "nl", "row_block",
                                             "col_block", "interpret"))
def bucket_intersect_padded(planes, *, slots: int, nl: int,
                            row_block: int = 8, col_block: int = 8,
                            interpret: bool = False):
    """All-pairs intersection counts over bucketized planes.

    planes: (G, slots*nl, B/128, 128) uint32 from build_bucket_layout with
    G a multiple of row_block and col_block.  Returns the PADDED device
    matrix (G, (G/col_block)*128) int32 where pair (a, b) lives at
    [a, (b//col_block)*128 + b%col_block] — use unpad_matrix.
    """
    g, p, bd, lanes = planes.shape
    assert lanes == LANES and p == slots * nl
    assert g % row_block == 0 and g % col_block == 0, (g, row_block, col_block)
    grid = (g // row_block, g // col_block, col_block)
    kern = functools.partial(_bucket_kernel, row_block, col_block, slots, nl)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((row_block, p, bd, LANES), lambda i, j, c: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p, bd, LANES),
                         lambda i, j, c, _cb=col_block: (j * _cb + c, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((row_block, LANES), lambda i, j, c: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=_sds((g, (g // col_block) * LANES), jnp.int32, planes),
        interpret=interpret,
    )(planes, planes)


def unpad_matrix(padded, g: int, col_block: int):
    """(G, (G/C)*128) padded device output -> (g, g) numpy int64."""
    import numpy as np
    m = np.asarray(padded)
    cols = np.arange(g)
    return m[:g, (cols // col_block) * LANES + cols % col_block].astype(
        np.int64)


def bucketized_all_pairs(keys, counts, window: int, *, slots: int = 4,
                         bucket_factor: int = 2, row_block: int = 8,
                         col_block: int = 8, interpret: bool = False):
    """Host-orchestrated exact G x G intersection matrix.

    keys (G, cap, 4) uint32 sorted-unique + counts (G,) — the canonical
    sketch artifact.  Builds the bucketized layout (host, once per sketch,
    reused for all G pairings), runs the Pallas kernel, and applies the
    exact host-side spill correction.  Returns (G, G) int64.
    """
    import numpy as np
    from spaced_kmer_sketching_tpu.ops.bucketized import (
        build_bucket_layout, spill_correction)

    keys = np.asarray(keys)
    counts = np.asarray(counts)
    g = keys.shape[0]
    blk = max(row_block, col_block)
    gp = max(blk, -(-g // blk) * blk)
    if gp != g:
        pad_k = np.full((gp - g,) + keys.shape[1:], 0xFFFFFFFF, np.uint32)
        keys_p = np.concatenate([keys, pad_k])
        counts_p = np.concatenate([counts, np.zeros(gp - g, counts.dtype)])
    else:
        keys_p, counts_p = keys, counts
    planes, spills = build_bucket_layout(keys_p, counts_p, window,
                                         slots=slots,
                                         bucket_factor=bucket_factor)
    nl = planes.shape[1] // slots
    padded = bucket_intersect_padded(jnp.asarray(planes), slots=slots, nl=nl,
                                     row_block=row_block,
                                     col_block=col_block,
                                     interpret=interpret)
    mat = unpad_matrix(padded, g, col_block)
    if any(len(s) for s in spills[:g]):
        mat = mat + spill_correction(keys, counts, spills[:g])
    return mat
