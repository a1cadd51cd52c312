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
BROWS = BLOCK // LANES            # 256
HALO_ROWS = BROWS + 8             # extra 1024 codes cover window-1 <= 63

# Survivor-compaction epilogue: "onehot" (k_slots x 4 one-hot lane
# reductions) or "butterfly" (7 routing rounds, cost independent of
# k_slots).  Both are bit-identical; butterfly is the default — measured
# on hardware at 3.65 ms/step vs 3.86 for onehot at k_slots=8 (and its
# cost does not grow when a smaller scale needs more slots).
import os as _os

from .sort import _sds
_EPILOGUE = _os.environ.get("SKS_EPILOGUE", "butterfly")


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


def _slide_far(x, j):
    """_slide for arbitrary j >= 0: whole-row part via a sublane roll,
    sub-row remainder via _slide.  j may be a TRACED scalar (the shared
    dynamic-window sweep program): pltpu.roll takes dynamic shifts, and a
    shift by the full axis size is the identity, so no Python branches
    are needed — only the lane-boundary select keys off the remainder."""
    rows = x.shape[0]
    if isinstance(j, int):
        rr, ll = divmod(j, LANES)
        if rr:
            x = pltpu.roll(x, rows - rr, 0)
        return _slide(x, ll)
    rr = j // LANES
    ll = j % LANES
    x = pltpu.roll(x, rows - rr, 0)
    a = pltpu.roll(x, LANES - ll, 1)
    b = pltpu.roll(a, rows - 1, 0)
    lane = lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lane < LANES - ll, a, b)


# --- packed window construction ------------------------------------------
# The scalar scheme slides the per-lane code stream `window` times (one
# slide per window offset).  The packed scheme pre-packs 16 2-bit codes per
# uint32 at the XLA level and reconstructs each strand's window words from
# ~2 packed slides per 32-bit word:
#   reverse-complement word m of window t = packed complemented codes
#     [t+16m .. t+16m+15]  (kmer_sliding.cpp:42-47 semantics: complement of
#     code[t+u] lands at bit-pair u+16m)
#   forward word q of window t = packed REVERSED codes starting at
#     e = t + window - 16q - 16 (code[t+window-1-j] at bit-pair j,
#     kmer_sliding.cpp:26-31)
# With Qc[t] = pack(~codes[16*(t>>4) ..]) and Qr[t] = pack-reversed, both
# repeated 16x so lanes are window-indexed, any packed word at offset o is
#   (Q[t+o'] >> s) | (Q[t+o'+16] << 32-s),  s = 2*((t+o) & 15)
# a per-lane-constant shift.  e can be negative by up to 15, so the arrays
# carry 8 leading pad rows (1024 codes) and all offsets are biased by
# _LEAD = 1024 (also keeps every DMA 1024-element aligned).
_LEAD = 8 * LANES
TILE_ROWS = HALO_ROWS + 8


def _extract_block_packed(qc, qr, rid, mask_vals, *, window, salt,
                          scale, variant, nwords=None):
    """Packed-slide kernel body: canonical masked keys + keep mask for one
    block.  qc/qr: (TILE_ROWS, 128) repeated packed plane VALUES (see
    above); rid likewise with 8 leading pad rows.

    `window` may be a TRACED scalar (the shared dynamic-window sweep
    program, with `nwords` then passed statically as the bucket's word
    count): every window-dependence below is a slide offset (dynamic
    rolls), a per-lane shift amount, or a mask AND — and mask words past
    the TRUE ceil(2*window/32) are zero, so over-provisioned static
    nwords only AND garbage slides with zero."""
    if nwords is None:
        nwords = (2 * window + 31) // 32
    lane = lax.broadcasted_iota(jnp.int32, (TILE_ROWS, LANES), 1)

    # slides at repeated offsets are shared: consecutive forward words
    # overlap (b1 of word q = b0 of word q-1, offsets step by 16), so
    # memoizing cuts the forward-strand slides from 2*nwords to nwords+1.
    # Keys are INDEX-based (m), not offset values, so the sharing holds
    # for traced offsets too.
    # reverse-complement strand: sequence-order complemented codes
    acs = [_slide_far(qc, _LEAD + 16 * m) for m in range(nwords + 1)]
    s_rc = (2 * (lane & 15)).astype(jnp.uint32)
    mr = []
    for m in range(nwords):
        x = (acs[m] >> s_rc) | (acs[m + 1] << ((32 - s_rc) & 31))
        mr.append(jnp.where(s_rc == 0, acs[m], x) & mask_vals[m])

    # forward strand: reversed codes ending at the window top; offsets
    # _LEAD + window - 16*m for m = 0..nwords (b0 of word q = slide m=q+1,
    # b1 of word q = slide m=q)
    rs = [_slide_far(qr, _LEAD + window - 16 * m) for m in range(nwords + 1)]
    mf = []
    for q in range(nwords):
        d = window - 16 * q - 16
        sb = (2 * ((lane + d) & 15)).astype(jnp.uint32)
        b0 = rs[q + 1]
        b1 = rs[q]
        x = (b0 << sb) | (b1 >> ((32 - sb) & 31))
        mf.append(jnp.where(sb == 0, b0, x) & mask_vals[q])

    zero = jnp.zeros((TILE_ROWS, LANES), jnp.uint32)
    while len(mf) < KEY_WORDS:      # mask has no bits past 2*window
        mf.append(zero)
        mr.append(zero)

    fwd_lt = mf[0] < mr[0]
    for q in range(1, KEY_WORDS):
        fwd_lt = (mf[q] < mr[q]) | ((mf[q] == mr[q]) & fwd_lt)
    canon = [jnp.where(fwd_lt, mf[q], mr[q])[:BROWS] for q in range(KEY_WORDS)]

    rid_a = _slide_far(rid, _LEAD)[:BROWS]
    rid_b = _slide_far(rid, _LEAD + window - 1)[:BROWS]
    valid = (rid_a == rid_b) & (rid_a >= 0)
    keep = valid & u64ops.fmh_keep(*canon, salt=salt, scale=scale,
                                   variant=variant)
    return canon, keep


def _extract_block(codes_s, rid_s, mask_vals, *, window, salt, scale,
                   variant):
    """Shared kernel body: canonical masked keys + keep mask for one block.
    mask_vals: 4 scalar uint32 mask lanes; salt: static int or scalar pair."""
    codes = codes_s[:]
    fw = [jnp.zeros((HALO_ROWS, LANES), jnp.uint32) for _ in range(KEY_WORDS)]
    rw = [jnp.zeros((HALO_ROWS, LANES), jnp.uint32) for _ in range(KEY_WORDS)]
    # one slide per offset serves BOTH strands: the forward word slot
    # window-1-j and the reverse-complement slot j read the same
    # codes[t + j] — the slides are the dominant per-window cost
    for j in range(window):
        s = _slide(codes, j)
        qf, rf = divmod(2 * (window - 1 - j), 32)
        fw[qf] = fw[qf] | (s << rf)
        qr, rr = divmod(2 * j, 32)
        rw[qr] = rw[qr] | ((jnp.asarray(3, jnp.uint32) - s) << rr)

    mf = [fw[q] & mask_vals[q] for q in range(KEY_WORDS)]
    mr = [rw[q] & mask_vals[q] for q in range(KEY_WORDS)]
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
    return canon, keep


def _start_dma(codes_hbm, rid_hbm, codes_s, rid_s, sems):
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


def _dma_group(hbms, scratches, sems, g, b, slot, brows: int = BROWS):
    """Issue the input copies for block (g, b) into buffer `slot`; tile row
    count comes from each scratch buffer's shape.  `brows` is the per-block
    row advance in the HBM plane (BROWS for window-space planes, 16 for the
    raw packed-word planes)."""
    row0 = pl.multiple_of(b * brows, brows)
    cps = []
    for i, (h, s) in enumerate(zip(hbms, scratches)):
        rows = s.shape[1]
        cps.append(pltpu.make_async_copy(
            h.at[g, pl.ds(row0, rows)], s.at[slot], sems.at[slot, i]))
    return cps


def _pipelined_dma(hbms, scratches, sems, nblocks: int,
                   shared: bool = False, brows: int = BROWS):
    """Double-buffered block input: wait on this block's copies (started by
    the previous grid step), prefetch the next block's into the other slot.
    Grid steps run sequentially per core, and scratch persists across them;
    a serialized start->wait cost ~5 ms per 512-block batch in DMA latency
    alone.

    shared=True: every batch element reads HBM plane row 0 (the input
    planes have a single genome row shared by all grid rows — fused
    multi-seed sketching, where only mask/salt vary per row)."""
    g = pl.program_id(0)
    b = pl.program_id(1)
    # slot parity must follow the GLOBAL step (g, b iterate row-major):
    # with an odd per-genome block count, b-parity desynchronizes from the
    # prefetching step at every genome boundary
    step = g * nblocks + b
    slot = step % 2
    first = (g == 0) & (b == 0)
    pg = 0 if shared else g

    @pl.when(first)
    def _():
        for cp in _dma_group(hbms, scratches, sems, pg, b, slot, brows):
            cp.start()

    for cp in _dma_group(hbms, scratches, sems, pg, b, slot, brows):
        cp.wait()

    last_b = b == nblocks - 1
    ng = jnp.where(last_b, g + 1, g)
    nb = jnp.where(last_b, 0, b + 1)
    png = 0 if shared else ng

    @pl.when(~(last_b & (g == pl.num_programs(0) - 1)))
    def _():
        for cp in _dma_group(hbms, scratches, sems, png, nb,
                             (step + 1) % 2, brows):
            cp.start()
    return slot


def _kernel(codes_hbm, rid_hbm, mask_ref, o0, o1, o2, o3, okeep,
            codes_s, rid_s, sems, *, window: int, salt: int, scale: int,
            variant: str):
    _start_dma(codes_hbm, rid_hbm, codes_s, rid_s, sems)
    canon, keep = _extract_block(
        codes_s, rid_s, [mask_ref[0, q] for q in range(KEY_WORDS)],
        window=window, salt=salt, scale=scale, variant=variant)
    o0[0], o1[0], o2[0], o3[0] = canon
    okeep[0] = keep.astype(jnp.uint32)


_CUMSUM = _os.environ.get("SKS_CUMSUM", "mxu")


def _lane_cumsum(x):
    """Inclusive cumsum along lanes (axis 1) of an (R, 128) int32/bool 0-1
    array.  Default: ONE bf16 matmul against a (128, 128) upper-triangular
    ones matrix — the MXU is otherwise idle in these kernels and the 7-round
    Hillis-Steele roll chain was ~5% of the extract kernel's VPU time.
    Exact: 0/1 values in bf16, sums <= 128 accumulated in f32.
    SKS_CUMSUM=rolls selects the VPU roll chain (A/B)."""
    if _CUMSUM == "mxu":
        j = lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
        l = lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
        tri = (j <= l).astype(jnp.bfloat16)
        cum = jnp.dot(x.astype(jnp.bfloat16), tri,
                      preferred_element_type=jnp.float32)
        return cum.astype(jnp.int32)
    x = x.astype(jnp.int32)
    lane = lax.broadcasted_iota(jnp.int32, x.shape, 1)
    for sh in (1, 2, 4, 8, 16, 32, 64):
        shifted = pltpu.roll(x, sh, 1)
        x = x + jnp.where(lane >= sh, shifted, 0)
    return x


def _compact_kernel(qc_hbm, qr_hbm, rid_hbm, mask_ref, salt_ref,
                    *refs, window: int, scale: int, variant: str,
                    k_slots: int, out_words: int = KEY_WORDS,
                    shared: bool = False):
    """Extract + filter + per-row compaction: each 128-window row emits its
    first `k_slots` surviving keys (slot s = the (s+1)-th kept window of the
    row, located via a lane cumsum + one-hot reduction).  Rows with more
    than k_slots survivors are detected outside via the emitted row counts
    (the caller retries at a larger capacity -> larger k_slots).

    mask_ref (G, 4) and salt_ref (G, 2) are per-batch-element: the batch
    axis can carry genomes (one mask broadcast) OR spaced seeds over one
    genome (fused multi-seed sketching, the EP analog of SURVEY.md §2.1).

    out_words < 4 emits only the low key words: canonical masked keys have
    no bits at positions >= 2*window (the mask has none, utils/masks.py),
    so words past ceil(2*window/32) are zero for every valid key and the
    finish carries proportionally less sort/compact/relayout work."""
    outs = refs[:out_words]
    ocnt, qc_s, qr_s, rid_s, sems = refs[out_words:]
    g = pl.program_id(0)
    slot = _pipelined_dma((qc_hbm, qr_hbm, rid_hbm), (qc_s, qr_s, rid_s),
                          sems, nblocks=pl.num_programs(1), shared=shared)
    if window is None:
        # shared dynamic-window program: the window rides salt_ref col 2
        # (one program serves every config of a (key_words, capacity)
        # sweep bucket); nwords is statically the bucket's word count
        win = salt_ref[g, 2].astype(jnp.int32)   # value <= 64: exact
        nw_static = out_words
    else:
        win, nw_static = window, None
    canon, keep = _extract_block_packed(
        qc_s[slot], qr_s[slot], rid_s[slot],
        [mask_ref[g, q] for q in range(KEY_WORDS)],
        window=win, salt=(salt_ref[g, 0], salt_ref[g, 1]),
        scale=scale, variant=variant, nwords=nw_static)
    canon = canon[:out_words]
    _compact_epilogue(canon, keep, outs, ocnt, k_slots, out_words)


def _compact_epilogue(canon, keep, outs, ocnt, k_slots: int, out_words: int):
    """Per-row survivor compaction + output writes shared by the window-
    plane and raw-plane compact kernels."""
    if _EPILOGUE == "butterfly":
        # order-preserving butterfly lane routing (7 rounds, cost
        # independent of k_slots) — the same network the finish's
        # compact_rows kernel uses.  No pre-masking: the routing only
        # moves keep-flagged lanes, residue past each row's count is
        # sentinel-masked via svalid below, and the helper's internal
        # cumsum doubles as rowcnt (the previous separate cumsum +
        # pre-mask cost ~25 VPU ops/window, measured ~7% of the step).
        from .compact import _butterfly_compact_lanes
        packed, rowcnt = _butterfly_compact_lanes(canon, keep)
        slotw = [p[:, :k_slots] for p in packed]
    else:
        cum = _lane_cumsum(keep)                      # (BROWS, 128)
        rowcnt = jnp.max(cum, axis=1, keepdims=True)  # = cum[:, -1]
        # Mosaic lacks unsigned reductions (and 1-D bitcasts); summing the
        # one-hot selection in int32 is bit-identical (exactly one non-zero
        # term per row), so bitcast 2-D planes in and back out.
        canon_i = [pltpu.bitcast(c, jnp.int32) for c in canon]
        slots = [[] for _ in range(out_words)]
        for s in range(k_slots):
            ind = (cum == s + 1) & keep              # one-hot per row
            for q in range(out_words):
                slots[q].append(
                    jnp.sum(jnp.where(ind, canon_i[q], 0), axis=1,
                            keepdims=True))          # (BROWS, 1) int32
        slotw = [pltpu.bitcast(jnp.concatenate(s_, axis=1), jnp.uint32)
                 for s_ in slots]
    svalid = jax.lax.broadcasted_iota(
        jnp.int32, (BROWS, k_slots), 1) < rowcnt
    # NOTE a (BROWS, k_slots) minor dim of 8-16 is lane-padded by XLA and
    # the finish's reshape pays a relayout copy (~0.4 ms/step measured);
    # writing 128-lane-dense via an in-kernel reshape is NOT possible —
    # Mosaic rejects the (BROWS, ks) -> (ks*BROWS/128, 128) shape cast
    # ("infer-vector-layout: unsupported shape cast", verified on hw).
    for q, oref in enumerate(outs):
        oref[0] = jnp.where(svalid, slotw[q], jnp.uint32(0xFFFFFFFF))
    ocnt[0] = rowcnt.astype(jnp.int32)


# --- raw-plane compact kernel ---------------------------------------------
#
# The compact-upload path (0.25 B/nt) originally expanded the raw packed
# words to the 16x window-index planes IN XLA (repeat + concat: ~12-15 ms
# of pad/copy passes per 128 x 1.55M-nt dispatch, measured by trace) and
# the kernel re-read the expanded 2.4 GB from HBM.  This kernel reads the
# RAW words directly (16x less DMA) and expands them in VMEM: the
# expansion out[r, l] = praw[8r + 64 + (l >> 4)] is a fixed 0/1 selection,
# evaluated as one exact f32 MXU matmul per 16-bit half (each output
# element is a single-term sum of a value < 2^16, exact in f32) — every
# reshape keeps the 128-lane minor dim intact, sidestepping Mosaic's
# unsupported shape casts.  Run ids are computed arithmetically from the
# run-start bounds in SMEM, so no run-id plane exists at all.

RAW_ROWS = TILE_ROWS // 16 + 1        # 18: words 64..2303 cover the tile


def _expand_words(raw):
    """(RAW_ROWS, 128) uint32 raw words -> (TILE_ROWS, 128) window-indexed
    plane: out[r, l] = flat(raw)[8*r + 64 + (l >> 4)].

    Output chunk c (16 tile rows) reads words 64..191 of raw rows (c, c+1).
    The whole expansion is ONE stacked selection matmul: the four 8-bit
    value chunks of each word ride the M axis (M = 4*24, chunk rows padded
    to a sublane multiple) and the row-c / row-(c+1) source words ride the
    K axis (lane concat, K = 256), preceded by two tiny row-pick matmuls.
    The first formulation ran 12 separate M=17 matmuls per plane per tile
    (4 row-shift + 8 selection) — the MXU runs M=17 at ~13% utilization
    and each tiny matmul pays fixed issue cost; stacking measured the
    compact dispatch 60.9 -> 52.5 ms at g=128 (r5).  Exactness: operands
    are 8-bit values and 0/1 selectors, so every output element is a
    single-term sum — exact in bf16 x bf16 -> f32 (16-bit value chunks
    would ROUND: TPU matmuls compute in bf16 at default precision,
    verified on hardware).  Matmuls are used instead of rolls/slices
    because Mosaic rejects concatenating/materializing operands whose
    sublane offset differs (roll and [1:] slices both carry a lazy offset
    layout), while matmul outputs are always offset-canonical."""
    chunks = TILE_ROWS // 16          # 17
    cp = 24                           # chunk rows padded to a sublane mult
    nb = 4                            # 8-bit value chunks per uint32

    # byte planes stacked on sublanes: B[k*RAW_ROWS + r, l] = byte_k(raw)
    B = jnp.concatenate(
        [pltpu.bitcast((raw >> (8 * k)) & jnp.uint32(0xFF),
                       jnp.int32).astype(jnp.bfloat16) for k in range(nb)],
        axis=0)                                         # (72, 128)

    # row picks: A[k*cp + c] = byte_k row c;  Nx[k*cp + c] = byte_k row c+1
    co = lax.broadcasted_iota(jnp.int32, (nb * cp, nb * RAW_ROWS), 0)
    ro = lax.broadcasted_iota(jnp.int32, (nb * cp, nb * RAW_ROWS), 1)
    same = (co // cp == ro // RAW_ROWS) & (co % cp < chunks)
    ea = (same & (ro % RAW_ROWS == co % cp)).astype(jnp.bfloat16)
    eb = (same & (ro % RAW_ROWS == co % cp + 1)).astype(jnp.bfloat16)
    A = jnp.dot(ea, B, preferred_element_type=jnp.float32) \
        .astype(jnp.bfloat16)
    Nx = jnp.dot(eb, B, preferred_element_type=jnp.float32) \
        .astype(jnp.bfloat16)
    C = jnp.concatenate([A, Nx], axis=1)                # (96, 256)

    # selection: w = 8*s + 64 + (l >> 4) over j = s*128 + l; K rows
    # 0..127 hold row c (covers w in [64, 128)), 128..255 hold row c+1
    # (covers w - 128 in [0, 64) -> K row 128 + (w - 128) = w): both
    # branches reduce to w2 == w on the stacked K axis.
    w2 = lax.broadcasted_iota(jnp.int32, (2 * LANES, 16 * LANES), 0)
    j = lax.broadcasted_iota(jnp.int32, (2 * LANES, 16 * LANES), 1)
    w = 8 * (j // LANES) + 64 + (j % LANES) // 16
    sel = (w2 == w).astype(jnp.bfloat16)                # (256, 2048)

    ob = pltpu.bitcast(
        jnp.dot(C, sel, preferred_element_type=jnp.float32)
        .astype(jnp.int32), jnp.uint32).reshape(nb, cp, 16 * LANES)
    out = ob[0] | (ob[1] << 8) | (ob[2] << 16) | (ob[3] << 24)
    return out[:chunks].reshape(chunks, 16, LANES).reshape(TILE_ROWS, LANES)


def _compact_raw_kernel(pc_hbm, mask_ref, salt_ref, bounds_ref,
                        meta_ref, *refs, window: int, scale: int,
                        variant: str, k_slots: int, out_words: int,
                        k_bounds: int):
    """_compact_kernel fed by the RAW packed-word plane: VMEM expansion via
    _expand_words, run ids from bounds (meta_ref (G, 2) = [rid0, vlen]).

    Only the COMPLEMENTED plane ~p streams from HBM: the reversed plane
    is an element-local transform of it — pr[w] = rev2bit(p[w]) and the
    expansion is a pure word selection, so qr = rev2bit(~qc) in VMEM
    (~10 shift/mask ops per cell vs a second 100-MFLOP selection matmul
    + DMA stream + scratch; measured the compact dispatch 46.0 ->
    41.5 ms at g=128, r5).  The lead/fill regions differ from the old
    two-plane form (rev2bit(~0) = ~0, not 0) but only feed windows whose
    run-id validity is false, which the keep mask drops before
    compaction — outputs are bit-identical (tested)."""
    outs = refs[:out_words]
    ocnt, pc_s, sems = refs[out_words:]
    g = pl.program_id(0)
    b = pl.program_id(1)
    slot = _pipelined_dma((pc_hbm,), (pc_s,), sems,
                          nblocks=pl.num_programs(1), brows=16)
    qc = _expand_words(pc_s[slot])
    m2 = jnp.uint32(0x33333333)
    m4 = jnp.uint32(0x0F0F0F0F)
    m8 = jnp.uint32(0x00FF00FF)
    w_ = ~qc
    w_ = ((w_ & m2) << 2) | ((w_ >> 2) & m2)
    w_ = ((w_ & m4) << 4) | ((w_ >> 4) & m4)
    w_ = ((w_ & m8) << 8) | ((w_ >> 8) & m8)
    qr = (w_ << 16) | (w_ >> 16)

    # run-id tile: t = code position of tile element (r, l); id = rid0 +
    # (# run starts <= t), -1 outside [0, vlen) — matches the expanded
    # rid plane of ops/sketch.sketch_batch_compact bit-exactly
    row = lax.broadcasted_iota(jnp.int32, (TILE_ROWS, LANES), 0)
    lane = lax.broadcasted_iota(jnp.int32, (TILE_ROWS, LANES), 1)
    t = b * BLOCK + row * LANES + lane - _LEAD
    r = jnp.full((TILE_ROWS, LANES), meta_ref[g, 0], jnp.int32)
    for kk in range(k_bounds):
        r = r + (t >= bounds_ref[g, kk]).astype(jnp.int32)
    rid = jnp.where((t >= 0) & (t < meta_ref[g, 1]), r, jnp.int32(-1))

    canon, keep = _extract_block_packed(
        qc, qr, rid, [mask_ref[g, q] for q in range(KEY_WORDS)],
        window=window, salt=(salt_ref[g, 0], salt_ref[g, 1]),
        scale=scale, variant=variant)
    canon = canon[:out_words]
    _compact_epilogue(canon, keep, outs, ocnt, k_slots, out_words)


def extract_compact_windows_raw(p, bounds, rid0, vlen, mask_words, *,
                                nw: int, window: int, salt, scale: int,
                                variant: str, k_slots: int,
                                out_words: int = KEY_WORDS,
                                interpret: bool = False):
    """Compact-input kernel entry: p (G, body/16) uint32 raw 2-bit packed
    codes (16 per word LSB-first, positions past the genome packed as 0),
    bounds (G, K) int32 sorted interior run starts (padded with a value
    past every position), rid0/vlen (G,) int32.  Output contract identical
    to extract_compact_windows_prepacked."""
    g, n16 = p.shape
    nwp = ((nw + BLOCK - 1) // BLOCK) * BLOCK
    nblocks = nwp // BLOCK
    rows = nblocks * 16 + RAW_ROWS - 16
    assert 32 * out_words >= 2 * window

    # complemented pack = bitwise NOT (sum_u (3-c_u)<<2u == ~sum_u c_u<<2u);
    # the REVERSED plane never exists: the kernel derives it from the
    # expanded complemented plane element-locally (see _compact_raw_kernel)
    lead = jnp.zeros((g, LANES), jnp.uint32)
    pad = rows * LANES - LANES - n16
    fill = jnp.zeros((g, pad), jnp.uint32)
    pc2 = jnp.concatenate([lead, ~p, fill], axis=1).reshape(g, rows, LANES)

    mask_words, salts = _norm_mask_salt(mask_words, salt, g)
    k_bounds = bounds.shape[1]
    meta = jnp.stack([rid0.astype(jnp.int32), vlen.astype(jnp.int32)],
                     axis=1)

    kern = functools.partial(_compact_raw_kernel, window=window, scale=scale,
                             variant=variant, k_slots=k_slots,
                             out_words=out_words, k_bounds=k_bounds)
    rows_out = nwp // LANES
    word_shape = _sds((g, rows_out, k_slots), jnp.uint32, pc2, salts)
    outs = pl.pallas_call(
        kern,
        grid=(g, nblocks),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((g, KEY_WORDS), lambda gi, b: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((g, 2), lambda gi, b: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((g, k_bounds), lambda gi, b: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((g, 2), lambda gi, b: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=(
            [pl.BlockSpec((1, BROWS, k_slots), lambda gi, b: (gi, b, 0),
                          memory_space=pltpu.VMEM)] * out_words
            + [pl.BlockSpec((1, BROWS, 1), lambda gi, b: (gi, b, 0),
                            memory_space=pltpu.VMEM)]),
        out_shape=[word_shape] * out_words + [
            _sds((g, rows_out, 1), jnp.int32, pc2, salts)],
        scratch_shapes=[
            pltpu.VMEM((2, RAW_ROWS, LANES), jnp.uint32),
            pltpu.SemaphoreType.DMA((2, 1)),
        ],
        interpret=interpret,
    )(pc2, mask_words, salts, bounds.astype(jnp.int32), meta)
    words = [o.reshape(g, rows_out * k_slots) for o in outs[:out_words]]
    rowcnt = outs[out_words].reshape(g, rows_out)
    return words, rowcnt, nw


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
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, KEY_WORDS), lambda gi, b: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[pl.BlockSpec((1, BROWS, LANES), lambda gi, b: (gi, b, 0),
                                memory_space=pltpu.VMEM)] * 5,
        out_shape=[_sds((g, nwp // LANES, LANES), jnp.uint32,
                        codes2)] * 5,
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


def packed_body(n: int) -> int:
    """Window-INDEPENDENT padded code count for n-nt genomes: covers the
    largest possible window-block grid plus the trailing halo, so one packed
    upload serves every (window, k) config of a sweep."""
    nwp_max = ((n + BLOCK - 1) // BLOCK) * BLOCK
    return nwp_max + HALO_ROWS * LANES - BLOCK


def pack_genomes_np(codes, run_id):
    """HOST-side prep for the packed kernel (numpy, once per genome upload):
    pad, 16-per-u32 pack the complemented and the reversed code streams,
    expand to window-index space, prepend _LEAD pad rows.

    Packing is window- and mask-independent, so the sweep reuses one upload
    for all 62 configs.  Doing this at ingest (not in-jit) matters: the jnp
    formulation lowered to while-loops + dynamic slices costing ~10 ms per
    2M-nt batch step — more than the extraction kernel itself.

    codes (G, n) uint8/32 values 0..3; run_id (G, n) int32.
    Returns (qc, qr, rid) as (G, rows, 128) device-layout arrays."""
    import numpy as np
    g, n = codes.shape
    body = packed_body(n)
    c = np.zeros((g, body), np.uint8)
    c[:, :n] = codes
    r = np.full((g, body), -1, np.int32)
    r[:, :n] = run_id
    cc = c.reshape(g, body // 16, 16).astype(np.uint32)
    w = np.uint32(1) << (2 * np.arange(16, dtype=np.uint32))
    pc = ((np.uint32(3) - cc) * w).sum(-1, dtype=np.uint32)
    pr = (cc[..., ::-1] * w).sum(-1, dtype=np.uint32)
    lead32 = np.zeros((g, _LEAD), np.uint32)
    qc = np.concatenate([lead32, np.repeat(pc, 16, axis=1)], axis=1)
    qr = np.concatenate([lead32, np.repeat(pr, 16, axis=1)], axis=1)
    rid = np.concatenate([np.full((g, _LEAD), -1, np.int32), r], axis=1)
    return (qc.reshape(g, -1, LANES), qr.reshape(g, -1, LANES),
            rid.reshape(g, -1, LANES))


def _pad_batch_packed(codes, run_id, window):
    """In-jit prep for legacy callers (multi-seed, tests): same layout as
    pack_genomes_np but traced.  Hot paths pre-pack on host instead."""
    g, n = codes.shape
    nw = n - window + 1
    nwp = ((nw + BLOCK - 1) // BLOCK) * BLOCK
    need = packed_body(n)
    pad = need - n
    if pad > 0:
        codes = jnp.concatenate(
            [codes, jnp.zeros((g, pad), codes.dtype)], axis=1)
        run_id = jnp.concatenate(
            [run_id, jnp.full((g, pad), -1, run_id.dtype)], axis=1)
    c = codes.astype(jnp.uint32).reshape(g, need // 16, 16)
    pc = jnp.zeros((g, need // 16), jnp.uint32)
    pr = jnp.zeros((g, need // 16), jnp.uint32)
    for u in range(16):
        pc = pc | ((jnp.uint32(3) - c[..., u]) << (2 * u))
        pr = pr | (c[..., 15 - u] << (2 * u))
    qc = jnp.repeat(pc, 16, axis=1)
    qr = jnp.repeat(pr, 16, axis=1)
    lead = jnp.zeros((g, _LEAD), jnp.uint32)
    qc = jnp.concatenate([lead, qc], axis=1)
    qr = jnp.concatenate([lead, qr], axis=1)
    rid = jnp.concatenate(
        [jnp.full((g, _LEAD), -1, run_id.dtype), run_id], axis=1)
    return (qc.reshape(g, -1, LANES), qr.reshape(g, -1, LANES),
            rid.reshape(g, -1, LANES), nw, nwp)


def _norm_mask_salt(mask_words, salt, g):
    if mask_words.ndim == 1:
        mask_words = jnp.broadcast_to(mask_words, (g, KEY_WORDS))
    if isinstance(salt, int):
        salts = jnp.broadcast_to(jnp.asarray(
            [(salt >> 32) & 0xFFFFFFFF, salt & 0xFFFFFFFF], jnp.uint32),
            (g, 2))
    else:
        salts = salt
    return mask_words, salts


def extract_compact_windows_batched(codes, run_id, mask_words, *,
                                    window: int, salt, scale: int,
                                    variant: str, k_slots: int,
                                    out_words: int = KEY_WORDS,
                                    interpret: bool = False):
    """codes/run_id (G, n) -> (words 4 x (G, M) uint32 candidate key lanes
    with all-ones fill, rowcnt (G, R) int32 true per-row survivor counts),
    M = R * k_slots, R = padded-window-count / 128.

    Fused extract + filter + per-row compaction: the dominant costs of the
    sketch step (XLA lowers top_k to a full sort on TPU) collapse into the
    extraction kernel itself.  A row (128 consecutive windows) emits its
    first k_slots survivors; rows exceeding k_slots are detected via rowcnt
    by the caller, which retries with a larger capacity.

    mask_words may be (4,) (broadcast to the batch) or (G, 4) per-element;
    salt may be a host int (broadcast) or a (G, 2) uint32 [hi, lo] array —
    per-element masks/salts make the batch axis carry spaced SEEDS over one
    genome (fused multi-seed sketching)."""
    assert window <= 64, "window exceeds MAX_KMER_LENGTH"
    qc2, qr2, rid2, nw, nwp = _pad_batch_packed(codes, run_id, window)
    return extract_compact_windows_prepacked(
        qc2, qr2, rid2, mask_words, nw=nw, window=window, salt=salt,
        scale=scale, variant=variant, k_slots=k_slots, out_words=out_words,
        interpret=interpret)


def extract_compact_windows_prepacked(qc2, qr2, rid2, mask_words, *,
                                      nw: int, window: int, salt, scale: int,
                                      variant: str, k_slots: int,
                                      out_words: int = KEY_WORDS,
                                      batch: int = 0,
                                      interpret: bool = False):
    """Kernel entry on pre-packed (G, rows, 128) planes from pack_genomes_np
    (or _pad_batch_packed); nw = true window count of the original codes.
    out_words <= 4 selects how many low key-word planes are emitted (all
    higher words are zero for every valid key when 2*window <= 32*out_words
    — see _compact_kernel).

    batch > plane rows (which must then be 1) runs `batch` grid rows that
    all read the SAME genome planes from HBM while mask/salt stay
    per-row — fused multi-seed sketching without replicating the packed
    genome S times (neither in HBM nor as in-jit re-packing)."""
    g = batch or qc2.shape[0]
    shared = g != qc2.shape[0]
    if shared:
        assert qc2.shape[0] == 1, (qc2.shape, g)
    nwp = ((nw + BLOCK - 1) // BLOCK) * BLOCK
    rows = nwp // LANES
    if window is None:
        # shared dynamic-window program: salt must arrive as a (g, 3)
        # uint32 array [salt_hi, salt_lo, window]; nw is the bucket's
        # window-independent upper bound (validity is enforced per window
        # by the run-id compare inside the kernel)
        assert not isinstance(salt, int) and salt.shape[1] == 3, \
            "dynamic-window entry needs (g, 3) [hi, lo, window] salts"
    else:
        assert 32 * out_words >= 2 * window

    mask_words, salts = _norm_mask_salt(mask_words, salt, g)

    kern = functools.partial(_compact_kernel, window=window,
                             scale=scale, variant=variant, k_slots=k_slots,
                             out_words=out_words, shared=shared)
    word_shape = _sds((g, rows, k_slots), jnp.uint32, qc2, salts)
    outs = pl.pallas_call(
        kern,
        grid=(g, nwp // BLOCK),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((g, KEY_WORDS), lambda gi, b: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((g, salts.shape[1]), lambda gi, b: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=(
            [pl.BlockSpec((1, BROWS, k_slots), lambda gi, b: (gi, b, 0),
                          memory_space=pltpu.VMEM)] * out_words
            + [pl.BlockSpec((1, BROWS, 1), lambda gi, b: (gi, b, 0),
                            memory_space=pltpu.VMEM)]),
        out_shape=[word_shape] * out_words + [
            _sds((g, rows, 1), jnp.int32, qc2, salts)],
        scratch_shapes=[
            pltpu.VMEM((2, TILE_ROWS, LANES), jnp.uint32),
            pltpu.VMEM((2, TILE_ROWS, LANES), jnp.uint32),
            pltpu.VMEM((2, TILE_ROWS, LANES), jnp.int32),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
        interpret=interpret,
    )(qc2, qr2, rid2, mask_words, salts)
    words = [o.reshape(g, rows * k_slots) for o in outs[:out_words]]
    rowcnt = outs[out_words].reshape(g, rows)
    return words, rowcnt, nw
