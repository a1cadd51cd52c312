"""Pallas TPU kernel: chunked S^T E S Gram accumulation over a sorted
packed (key, gid) stream — the macro-tile engine of the blocked all-pairs
schedule (reference semantics: per-pair hash-probe counts,
src/kmer_set.cpp:23-41, over ordered all-pairs, src/generators.hpp:45-58).

The XLA lax.scan formulation (ops/gram._gram_chunks_packed) materializes
the per-chunk equality matrix E and the partial product T = E @ S_c to
HBM between ops — gigabytes of traffic per 2M-entry macro-tile.  This
kernel keeps everything in VMEM: each grid step reads CB chunks (one
chunk = 128 consecutive sorted entries), builds E/S as broadcast compares
in registers, and accumulates the rect Gram with two MXU dots per chunk
plus one batched boundary-correction dot per step.  Output is the
(block, block) RECT part only: rows = gids < block, cols = gids >= block
(the jj side of a merged macro-tile pair).

Layout: a chunk's entries must appear on the SUBLANE axis for S (one-hot
rows feed the MXU contraction) and on the LANE axis for E's second
operand.  Instead of transposing in-kernel (Mosaic relayouts are
restricted), the kernel takes BOTH layouts of the merged planes —
(nchunks, 128) and its XLA-side transpose (128, nchunks) — and every
operand falls out of broadcast compares: E[i, k] = (col_i == row_k),
S[i, g] = (gid_col_i == iota_g).  The Gram dots contract over axis 0 of
both operands (dot_general), which the MXU does natively — no relayouts.

Two Mosaic constraints shape the grid: (a) the transposed block's lane
dimension must be 128, so transposed fetches cover 128 chunks; (b) the
unrolled body's temporaries are stack-allocated WITHOUT reuse, so 128
chunks per step overflow the 16 MB VMEM stack (observed 37 MB).  Hence
each grid step processes CB=32 chunks: the orig blocks advance per step,
the transposed block advances every 128/CB steps, and four exclusive
pl.when branches select the step's 32-column slice at STATIC offsets.

Cross-chunk key runs are handled exactly as in the XLA scan: a cumulative
open-run carry P (the multi-hot of the open run's earlier entries) and
the per-chunk carried-key prefix vector b add P b^T + b P^T; the carry
crosses grid steps through VMEM scratch (TPU grid steps run
sequentially, the same guarantee the extract kernel's DMA pipeline
uses).  The previous chunk's last key is read as a STATIC (1, 1) slice
of the original-layout row (chunk u-1, lane 127) — no scalar loads.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
CB = 32                       # chunks per grid step (unrolled)
_SUBS = LANES // CB           # trans-block column groups per fetch


def _process(orig, trans, out, acc_s, p_s, pk_s, col0: int, *, pw: int,
             gidbits: int, block: int):
    gp2 = 2 * block
    gmask = jnp.uint32((1 << gidbits) - 1)
    iota_g = lax.broadcasted_iota(jnp.int32, (1, gp2), 1)
    acc = jnp.zeros((block, block), jnp.float32)
    p_vec = p_s[0:1, :]                   # (1, gp2) carry BEFORE this step
    p_rows, b_rows = [], []
    lk = None
    for u in range(CB):
        j = col0 + u
        col = [trans[q][:, j:j + 1] for q in range(pw)]      # (128, 1)
        row = [orig[q][u:u + 1, :] for q in range(pw)]       # (1, 128)
        valid_t = (col[pw - 1] >> 31) == 0                   # guard bit
        kf_col = [col[0] & ~gmask] + col[1:]
        kf_row = [row[0] & ~gmask] + row[1:]
        eq = kf_col[0] == kf_row[0]
        for q in range(1, pw):
            eq = eq & (kf_col[q] == kf_row[q])               # (128, 128)
        gid = (col[0] & gmask).astype(jnp.int32)
        s = ((gid == iota_g) & valid_t).astype(jnp.bfloat16)  # (128, gp2)
        # Mosaic requires 32-bit matmul accumulators; T's 0/1-sum entries
        # are <= 128, so the bf16 round-trip for the second dot is exact
        t = jnp.dot(eq.astype(jnp.bfloat16), s[:, block:],
                    preferred_element_type=jnp.float32)       # (128, block)
        acc = acc + lax.dot_general(
            s[:, :block], t.astype(jnp.bfloat16),
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        # carried-key prefix b and last-run vector a ((1, gp2) each)
        lk = [kf_row[q][0:1, 127:128] for q in range(pw)]     # (1, 1)
        if u == 0:
            pk = [pk_s[q:q + 1, 0:1] for q in range(pw)]
        else:
            pk = [(orig[0][u - 1:u, 127:128] & ~gmask)] + [
                orig[q][u - 1:u, 127:128] for q in range(1, pw)]
        eqp = valid_t
        eql = valid_t
        for q in range(pw):
            eqp = eqp & (kf_col[q] == pk[q])
            eql = eql & (kf_col[q] == lk[q])
        # partial sums <= 128 stay exact in bf16
        b = jnp.sum(s * eqp.astype(jnp.bfloat16), axis=0,
                    keepdims=True).astype(jnp.float32)
        a = jnp.sum(s * eql.astype(jnp.bfloat16), axis=0,
                    keepdims=True).astype(jnp.float32)
        cont = lk[0] == pk[0]
        for q in range(1, pw):
            cont = cont & (lk[q] == pk[q])
        p_rows.append(p_vec)
        b_rows.append(b)
        p_vec = jnp.where(cont, p_vec + a, a)
    pm = jnp.concatenate(p_rows, axis=0)                      # (CB, gp2)
    bm = jnp.concatenate(b_rows, axis=0)
    acc = acc + lax.dot_general(pm[:, :block], bm[:, block:],
                                (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    acc = acc + lax.dot_general(bm[:, :block], pm[:, block:],
                                (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    acc_s[...] = acc_s[...] + acc
    p_s[0:1, :] = p_vec
    for q in range(pw):
        pk_s[q:q + 1, :] = jnp.broadcast_to(lk[q], (1, pk_s.shape[1]))


def _kernel(*refs, pw: int, gidbits: int, block: int, nsteps: int):
    orig = refs[:pw]                      # (CB, 128) blocks, step-indexed
    trans = refs[pw:2 * pw]               # (128, 128) blocks, group-indexed
    out = refs[2 * pw]                    # (block, block) int32
    acc_s, p_s, pk_s = refs[2 * pw + 1:]  # scratch
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_s[...] = jnp.zeros((block, block), jnp.float32)
        p_s[...] = jnp.zeros((8, 2 * block), jnp.float32)
        pk_s[...] = jnp.full((8, pw * LANES), jnp.uint32(0xFFFFFFFF),
                             jnp.uint32)

    sub = lax.rem(i, _SUBS)
    for v in range(_SUBS):
        @pl.when(sub == v)
        def _(v=v):
            _process(orig, trans, out, acc_s, p_s, pk_s, v * CB,
                     pw=pw, gidbits=gidbits, block=block)

    @pl.when(i == nsteps - 1)
    def _():
        out[...] = acc_s[...].astype(jnp.int32)


def gram_rect_scan(planes, *, gidbits: int, block: int,
                   interpret: bool = False):
    """planes: pw x (nchunks, 128) SORTED packed (key, gid) planes of a
    merged macro-tile pair (gids < block = row side, >= block = column
    side; sentinels all-ones).  Returns the (block, block) int32 rect
    intersection tile.  nchunks must be a multiple of 128."""
    pw = len(planes)
    nchunks = planes[0].shape[0]
    assert nchunks % LANES == 0, nchunks
    nsteps = nchunks // CB
    trans = [jnp.transpose(p) for p in planes]            # XLA-side
    # keep the operand arrays out of the kernel's fusion: XLA otherwise
    # materializes the transpose outputs into the pallas call's scoped
    # VMEM inside a scan body
    ops = lax.optimization_barrier(tuple(planes) + tuple(trans))
    planes, trans = ops[:pw], ops[pw:]
    kern = functools.partial(_kernel, pw=pw, gidbits=gidbits, block=block,
                             nsteps=nsteps)
    out = pl.pallas_call(
        kern,
        grid=(nsteps,),
        in_specs=(
            [pl.BlockSpec((CB, LANES), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)] * pw
            + [pl.BlockSpec((LANES, LANES), lambda i: (0, i // _SUBS),
                            memory_space=pltpu.VMEM)] * pw),
        out_specs=pl.BlockSpec((block, block), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((block, block), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((block, block), jnp.float32),
            pltpu.VMEM((8, 2 * block), jnp.float32),
            pltpu.VMEM((8, pw * LANES), jnp.uint32),
        ],
        interpret=interpret,
    )(*planes, *trans)
    return out
