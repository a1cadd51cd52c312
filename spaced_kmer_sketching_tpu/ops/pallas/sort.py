"""Pallas TPU bitonic sort for 128-bit keys (4 x uint32 lanes).

XLA's `lax.sort` with 4 key operands is the dominant cost of the sketch step
(multi-operand comparator sorts lower poorly on TPU).  This kernel runs the
classic bitonic network entirely in VMEM on the VPU:

  * keys live as four (R, 128) uint32 planes, flat index i = r * 128 + l;
  * a compare-exchange at distance d is two `pltpu.roll`s + a 128-bit
    lexicographic compare + selects — d < 128 rolls lanes, d >= 128 rolls
    sublanes (bitonic distances are powers of two, so exactly one of the two
    cases applies and the XOR partner i^d is reachable by +/-d rolls);
  * the full network for N rows is log2(N)*(log2(N)+1)/2 unrolled passes.

Sorts ascending with all-ones sentinel padding sorting to the back — the
invariant ops/sketch.py needs.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
KEY_WORDS = 4


def _sds(shape, dtype, *likes):
    """ShapeDtypeStruct whose varying-manual-axes are the UNION of the
    `likes` operands': under shard_map with device-varying operands,
    pallas_call out_shapes must declare how outputs vary across mesh axes
    (check_vma) — outputs of these kernels vary like their inputs, and a
    kernel with several inputs (e.g. a replicated genome plane plus
    sharded per-seed salts) varies with any of them."""
    vma = frozenset()
    for like in likes:
        vma = vma | getattr(jax.typeof(like), "vma", frozenset())
    return jax.ShapeDtypeStruct(shape, dtype, vma=vma)


def _partner(x, d: int):
    """x[i ^ d] over the flattened (R, 128) plane, d a power of two."""
    if d < LANES:
        fwd = pltpu.roll(x, LANES - d, 1)   # x[r, (l+d) % 128]
        bwd = pltpu.roll(x, d, 1)           # x[r, (l-d) % 128]
        lane = lax.broadcasted_iota(jnp.int32, x.shape, 1)
        return jnp.where((lane & d) == 0, fwd, bwd)
    e = d // LANES
    rows = x.shape[0]
    fwd = pltpu.roll(x, rows - e, 0)
    bwd = pltpu.roll(x, e, 0)
    row = lax.broadcasted_iota(jnp.int32, x.shape, 0)
    return jnp.where((row & e) == 0, fwd, bwd)


def _lex_lt(a, b):
    lt = a[0] < b[0]
    for q in range(1, len(a)):
        lt = (a[q] < b[q]) | ((a[q] == b[q]) & lt)
    return lt


def _lex_lt_tb(a, b, nkeys: int = KEY_WORDS):
    """Multi-word key compare (planes [0:nkeys], ascending significance)
    with any extra planes as LEAST-significant tiebreakers.  A
    compare-exchange on exactly-equal operands duplicates one side's value
    at both positions — invisible for the key planes but data loss for
    ride-along tags; folding the tags into the comparator makes the order
    total (for unique (key, tag) tuples), so a tie implies the full tuples
    are identical and duplication is a no-op."""
    seq_a = list(a[nkeys:])[::-1] + list(a[:nkeys])
    seq_b = list(b[nkeys:])[::-1] + list(b[:nkeys])
    lt = seq_a[0] < seq_b[0]
    for qa, qb in zip(seq_a[1:], seq_b[1:]):
        lt = (qa < qb) | ((qa == qb) & lt)
    return lt


def _sort_kernel(n: int, nplanes: int, *refs):
    ins, outs = refs[:nplanes], refs[nplanes:]
    x = [w[:] for w in ins]
    shape = x[0].shape
    row = lax.broadcasted_iota(jnp.int32, shape, 0)
    lane = lax.broadcasted_iota(jnp.int32, shape, 1)
    flat = row * LANES + lane

    stages = n.bit_length() - 1
    for k in range(1, stages + 1):
        # ascending iff bit k of the flat index is 0 (bitonic block 2^k);
        # at the final stage the bit is always 0, giving one ascending run
        asc = (flat & (1 << k)) == 0
        for j in range(k - 1, -1, -1):
            d = 1 << j
            p = [_partner(w, d) for w in x]
            x_lt_p = _lex_lt(x, p)
            lower = (flat & d) == 0
            take_min = lower == asc
            # min/max of (x, partner) per word, chosen by take_min
            want_x = take_min == x_lt_p   # keep own value?
            # tie (x == p): x_lt_p False -> want_x = ~take_min; both equal, fine
            x = [jnp.where(want_x, xi, pi) for xi, pi in zip(x, p)]
    for o, xi in zip(outs, x):
        o[:] = xi


@functools.partial(jax.jit, static_argnames=("interpret",))
def bitonic_sort_128(keys, interpret: bool = False):
    """Sort (N, W) uint32 multi-word rows ascending (W little-endian lanes,
    W = 4 for full 128-bit keys, fewer when the window geometry bounds the
    key to the low words); N a power of two >= 1024.

    N <= TILE_ELEMS runs as one unrolled bitonic network.  Larger N uses a
    tiled merge sort — Mosaic compile time scales with the unrolled pass
    count times the array size, and a monolithic 131k-row network took >8
    minutes to compile: tiles sort in parallel grid steps with alternating
    directions, then log2(T) small merge-round kernels combine them."""
    n, nw = keys.shape
    assert n & (n - 1) == 0 and n >= 1024, "N must be a power of two >= 1024"
    r = n // LANES
    planes = [keys[:, q].reshape(r, LANES) for q in range(nw)]
    if n <= TILE_ELEMS:
        kern = functools.partial(_sort_kernel, n, nw)
        outs = pl.pallas_call(
            kern,
            out_shape=[_sds((r, LANES), jnp.uint32,
                            planes[0])] * nw,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * nw,
            out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * nw,
            interpret=interpret,
        )(*planes)
    else:
        outs = _tile_sort(planes, interpret)
        lr = TILE_ROWS
        while lr < r:
            outs = _merge_round(outs, lr, interpret, nkeys=nw)
            lr *= 2
    return jnp.stack([o.reshape(n) for o in outs], axis=-1)


TILE_ROWS = 256
TILE_ELEMS = TILE_ROWS * LANES          # 32768


def _tile_sort_kernel(force_asc: bool, m: int, nplanes: int, *refs):
    """Full bitonic sort of one m-element tile; unless force_asc, direction
    alternates with grid id so adjacent tiles form bitonic sequences for
    the merges."""
    ins, outs = refs[:nplanes], refs[nplanes:]
    x = [w[:] for w in ins]
    shape = x[0].shape
    row = lax.broadcasted_iota(jnp.int32, shape, 0)
    lane = lax.broadcasted_iota(jnp.int32, shape, 1)
    flat = row * LANES + lane
    desc = jnp.bool_(False) if force_asc else (pl.program_id(0) % 2) == 1
    stages = m.bit_length() - 1
    for k in range(1, stages + 1):
        asc = ((flat & (1 << k)) == 0) != desc
        for j in range(k - 1, -1, -1):
            d = 1 << j
            p = [_partner(w, d) for w in x]
            x_lt_p = _lex_lt(x, p)
            lower = (flat & d) == 0
            want_x = (lower == asc) == x_lt_p
            x = [jnp.where(want_x, xi, pi) for xi, pi in zip(x, p)]
    for o, xi in zip(outs, x):
        o[:] = xi


def _tile_sort(planes, interpret, force_asc=False, tile_rows=TILE_ROWS):
    r = planes[0].shape[0]
    np_ = len(planes)
    t = r // tile_rows
    return pl.pallas_call(
        functools.partial(_tile_sort_kernel, force_asc, tile_rows * LANES,
                          np_),
        grid=(t,),
        in_specs=[pl.BlockSpec((tile_rows, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] * np_,
        out_specs=[pl.BlockSpec((tile_rows, LANES), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)] * np_,
        out_shape=[_sds((r, LANES), jnp.uint32, planes[0])] * np_,
        interpret=interpret,
    )(*planes)


def _multi_run_sort_kernel(run_elems: int, nplanes: int, *refs):
    """Sort every run_elems-long run inside one block independently,
    direction alternating with the GLOBAL run index.  Bitonic passes at
    distances < run_elems never cross run boundaries (runs are aligned
    powers of two), so many runs sort in a single grid step — grid-step
    overhead was dominating when each tiny run had its own step."""
    ins, outs = refs[:nplanes], refs[nplanes:]
    x = [w[:] for w in ins]
    shape = x[0].shape
    row = lax.broadcasted_iota(jnp.int32, shape, 0)
    lane = lax.broadcasted_iota(jnp.int32, shape, 1)
    flat = row * LANES + lane
    # The bitonic direction pattern must use RUN-LOCAL indices: at the
    # final stage the global bit at position log2(run_elems) is the run
    # parity itself, so using `flat` directly sorted odd runs the wrong
    # way.  asc = XNOR(bit_k(local), run_parity) in one integer expression.
    rbit = run_elems.bit_length() - 1
    local = flat & (run_elems - 1)
    for k in range(1, rbit + 1):
        asc = (((local >> k) ^ (flat >> rbit)) & 1) == 0
        for j in range(k - 1, -1, -1):
            d = 1 << j
            p = [_partner(w, d) for w in x]
            x_lt_p = _lex_lt(x, p)
            lower = (flat & d) == 0
            want_x = (lower == asc) == x_lt_p
            x = [jnp.where(want_x, xi, pi) for xi, pi in zip(x, p)]
    for o, xi in zip(outs, x):
        o[:] = xi


def sort_runs_128(planes, run_rows: int, interpret: bool = False):
    """Sort consecutive run_rows-row runs of (R, 128) planes independently,
    directions alternating (run i ascending iff i even) — the producer of
    bitonic run pairs for _merge_round.  Blocks cover as many whole runs as
    fit in a tile so small runs don't pay per-grid-step overhead."""
    r = planes[0].shape[0]
    np_ = len(planes)
    block_rows = min(r, max(run_rows, TILE_ROWS))
    rpb = block_rows // run_rows
    if (block_rows % run_rows or r % block_rows
            or rpb & (rpb - 1) or (rpb == 1 and r != block_rows)):
        # global parity needs an even run count per block; otherwise fall
        # back to one run per grid step with grid-id parity
        return _tile_sort(planes, interpret, force_asc=False,
                          tile_rows=run_rows)
    kern = functools.partial(_multi_run_sort_kernel, run_rows * LANES, np_)
    return pl.pallas_call(
        kern,
        grid=(r // block_rows,),
        in_specs=[pl.BlockSpec((block_rows, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] * np_,
        out_specs=[pl.BlockSpec((block_rows, LANES), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)] * np_,
        out_shape=[_sds((r, LANES), jnp.uint32, planes[0])] * np_,
        interpret=interpret,
    )(*planes)


@functools.partial(jax.jit, static_argnames=("capacity", "interpret"))
def sort_truncate_128(keys, capacity: int, interpret: bool = False):
    """Sort (M, W) rows and return the per-tile smallest capacity of them,
    globally sorted ascending: per-tile ascending sorts -> truncate each of
    the T tiles to capacity/T slots -> reverse odd runs -> bitonic merge
    rounds.  EXACT whenever every tile holds <= capacity/T non-sentinel
    rows (the caller checks tile occupancy and retries otherwise) — the
    use case is compacting a sparse sentinel-padded candidate array where
    sorting the full M rows wastes the sort on fill."""
    m, nw = keys.shape
    t = m // TILE_ELEMS
    cut = capacity // t
    assert m % TILE_ELEMS == 0 and t >= 2, "need >= 2 full tiles"
    assert cut >= LANES and cut % LANES == 0 and capacity % t == 0
    planes = [keys[:, q].reshape(m // LANES, LANES) for q in range(nw)]
    planes = _tile_sort(planes, interpret, force_asc=True)

    outs = []
    for pplane in planes:
        runs = pplane.reshape(t, TILE_ELEMS)[:, :cut]     # keep tile minima
        rev = runs[:, ::-1]
        parity = (lax.broadcasted_iota(jnp.int32, (t, 1), 0) % 2) == 1
        outs.append(jnp.where(parity, rev, runs).reshape(capacity // LANES,
                                                         LANES))
    lr = cut // LANES
    while lr < capacity // LANES:
        outs = _merge_round(outs, lr, interpret, nkeys=nw)
        lr *= 2
    return jnp.stack([o.reshape(capacity) for o in outs], axis=-1)


def _merge_round_kernel(lr: int, final: bool, nplanes: int, nkeys: int,
                        *refs):
    """Bitonic merge of adjacent (asc, desc) run pairs of lr rows each into
    a 2*lr-row run, direction by grid-id parity (ascending when final).
    The first `nkeys` planes are the sort key; any further planes ride
    along (e.g. a genome-id tag for the device-side Gram layout)."""
    ins, outs = refs[:nplanes], refs[nplanes:]
    x = [w[:] for w in ins]
    shape = x[0].shape
    row = lax.broadcasted_iota(jnp.int32, shape, 0)
    lane = lax.broadcasted_iota(jnp.int32, shape, 1)
    flat = row * LANES + lane
    asc = jnp.full(shape, True) if final else (pl.program_id(0) % 2) == 0
    d = lr * LANES
    while d >= 1:
        p = [_partner(w, d) for w in x]
        x_lt_p = _lex_lt_tb(x, p, nkeys)
        lower = (flat & d) == 0
        want_x = (lower == asc) == x_lt_p
        x = [jnp.where(want_x, xi, pi) for xi, pi in zip(x, p)]
        d //= 2
    for o, xi in zip(outs, x):
        o[:] = xi


MERGE_PALLAS_MAX_ROWS = 1024      # 2*lr beyond this overflows scoped VMEM


def _merge_finish_kernel(d0: int, blk_rows: int, run_rows: int, final: bool,
                         nplanes: int, nkeys: int, *refs):
    """All bitonic-merge passes at distances d0, d0/2, ..., 1 for one
    aligned blk_rows-row block — every such pass keeps i^d inside the
    block (d0 < blk_rows*LANES, both powers of two), so after the global
    cross-block passes have run, one kernel finishes the round entirely in
    VMEM.  Direction is constant per block: the block's position within
    its 2*lr-row merged run (run_rows rows) fixes the run parity."""
    ins, outs = refs[:nplanes], refs[nplanes:]
    x = [w[:] for w in ins]
    shape = x[0].shape
    row = lax.broadcasted_iota(jnp.int32, shape, 0)
    lane = lax.broadcasted_iota(jnp.int32, shape, 1)
    flat = row * LANES + lane
    if final:
        asc = jnp.full(shape, True)
    else:
        asc = ((pl.program_id(0) * blk_rows) // run_rows % 2) == 0
    d = d0
    while d >= 1:
        p = [_partner(w, d) for w in x]
        x_lt_p = _lex_lt_tb(x, p, nkeys)
        lower = (flat & d) == 0
        want_x = (lower == asc) == x_lt_p
        x = [jnp.where(want_x, xi, pi) for xi, pi in zip(x, p)]
        d //= 2
    for o, xi in zip(outs, x):
        o[:] = xi


def _merge_finish(planes, lr: int, blk_rows: int, interpret,
                  nkeys: int = KEY_WORDS):
    r = planes[0].shape[0]
    np_ = len(planes)
    kern = functools.partial(_merge_finish_kernel, blk_rows * LANES // 2,
                             blk_rows, 2 * lr, 2 * lr == r, np_, nkeys)
    return pl.pallas_call(
        kern,
        grid=(r // blk_rows,),
        in_specs=[pl.BlockSpec((blk_rows, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] * np_,
        out_specs=[pl.BlockSpec((blk_rows, LANES), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)] * np_,
        out_shape=[_sds((r, LANES), jnp.uint32, planes[0])] * np_,
        interpret=interpret,
    )(*planes)


def _merge_round(planes, lr: int, interpret, nkeys: int = KEY_WORDS):
    r = planes[0].shape[0]
    np_ = len(planes)
    if 2 * lr < 8:
        # Pallas block sublane minimum is 8 rows; tiny rounds (deep
        # finish-run trees at large capacities) run as XLA passes instead
        d = lr * LANES
        while d >= 1:
            planes = _merge_pass_xla(planes, d, 2 * lr * LANES, nkeys)
            d //= 2
        return planes
    if 2 * lr > MERGE_PALLAS_MAX_ROWS:
        # hybrid: only the cross-block passes (row distance >= blk) run as
        # XLA HBM passes — log2(2*lr/blk) of them instead of the full
        # log2(2*lr*LANES); everything below finishes in one VMEM kernel.
        blk = MERGE_PALLAS_MAX_ROWS
        d = lr * LANES
        while d >= blk * LANES:
            planes = _merge_pass_xla(planes, d, 2 * lr * LANES, nkeys)
            d //= 2
        return _merge_finish(planes, lr, blk, interpret, nkeys)
    blocks = r // (2 * lr)
    kern = functools.partial(_merge_round_kernel, lr, blocks == 1, np_,
                             nkeys)
    return pl.pallas_call(
        kern,
        grid=(blocks,),
        in_specs=[pl.BlockSpec((2 * lr, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] * np_,
        out_specs=[pl.BlockSpec((2 * lr, LANES), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)] * np_,
        out_shape=[_sds((r, LANES), jnp.uint32, planes[0])] * np_,
        interpret=interpret,
    )(*planes)


def _merge_pass_xla(planes, d: int, run: int, nkeys: int = KEY_WORDS):
    """One bitonic compare-exchange pass at element distance d as plain XLA
    (lexicographic min/max select — pure elementwise, no sort/top_k/
    gather).  `run` is the merged run length in elements; direction
    alternates per run (ascending when a single run remains).  Planes past
    `nkeys` ride along.

    When d is a row multiple (every hybrid-path pass: d >= blk*128) the
    pairing view keeps 128 as the MINOR dim — (nb, 2, d) put d minor,
    which changes the tiled layout and made XLA materialize relayout
    copies around every pass (8 reshape ops ~0.02 ms each per config-4
    tile, trace r5)."""
    r = planes[0].shape[0]
    m = r * LANES
    nb = m // (2 * d)
    if d % LANES == 0:
        dr = d // LANES
        x = [p.reshape(nb, 2, dr, LANES) for p in planes]
        lo = [xq[:, 0] for xq in x]
        hi = [xq[:, 1] for xq in x]
        asc_shape = (nb, 1, 1)
    else:
        x = [p.reshape(nb, 2, d) for p in planes]
        lo = [xq[:, 0, :] for xq in x]
        hi = [xq[:, 1, :] for xq in x]
        asc_shape = (nb, 1)
    lo_lt_hi = _lex_lt_tb(lo, hi, nkeys)
    if run >= m:
        asc = True
    else:
        blk0 = lax.broadcasted_iota(jnp.int32, asc_shape, 0) * (2 * d)
        asc = ((blk0 // run) % 2) == 0
    take_lo = lo_lt_hi == asc
    out = []
    for q in range(len(planes)):
        nl = jnp.where(take_lo, lo[q], hi[q])
        nh = jnp.where(take_lo, hi[q], lo[q])
        out.append(jnp.stack([nl, nh], axis=1).reshape(r, LANES))
    return out


def merge_pair_streams(pa, pb, interpret: bool = False,
                       nkeys: int = KEY_WORDS):
    """Merge TWO ascending sorted streams (each a list of (rows, 128)
    planes) into one ascending 2*rows-row stream WITHOUT materializing a
    reversal: the bitonic merge of [A asc, reverse(B)] pairs slot i with
    slot N+i in its first pass, and slot N+i holds B[N-1-i] — so pass one
    is computed directly as min/max(A[i], B[N-1-i]) with the reversal
    fused into the elementwise XLA pass.  merge_sorted_runs' standalone
    `rev` was 1.66 ms/tile on hardware (an unfused lane+sublane shuffle,
    ~20x HBM speed of light) because its output feeds a Pallas kernel and
    XLA cannot fuse into kernel operands; inline in an XLA select fusion
    it is ~free.  Remaining passes (d < N) are the ordinary hybrid rounds.
    The first `nkeys` planes are the key; extra planes ride along (same
    tie argument as _lex_lt_tb)."""
    rows = pa[0].shape[0]
    assert pb[0].shape[0] == rows
    # the bitonic pass distances (rows*LANES//2 halving to 1) only form a
    # valid merge network for power-of-two stream lengths; a non-power-of
    # -two would merge silently WRONG rather than error (ADVICE r4)
    assert rows & (rows - 1) == 0, rows
    brev = [b[::-1, ::-1] for b in pb]
    a_lt = _lex_lt_tb(pa, brev, nkeys)
    planes = [jnp.concatenate([jnp.where(a_lt, a, r),
                               jnp.where(a_lt, r, a)], axis=0)
              for a, r in zip(pa, brev)]
    if (2 * rows < 8) or (jax.default_backend() != "tpu"
                          and not interpret):
        # sub-minimum-block tiles / CPU: plain XLA passes (d = N done)
        d = rows * LANES // 2
        while d >= 1:
            planes = _merge_pass_xla(planes, d, 2 * rows * LANES, nkeys)
            d //= 2
        return planes
    blk = min(MERGE_PALLAS_MAX_ROWS, 2 * rows)
    d = rows * LANES // 2
    while d >= blk * LANES:
        planes = _merge_pass_xla(planes, d, 2 * rows * LANES, nkeys)
        d //= 2
    # when blk == 2*rows the finish kernel's first pass (d0 = rows*LANES)
    # repeats the fused pass above — a compare-exchange is idempotent, so
    # this only costs one redundant VMEM pass and keeps small tiles off
    # the log2(N)-XLA-HBM-pass path
    return _merge_finish(planes, rows, blk, interpret, nkeys)


def merge_sorted_runs(planes, run_rows: int, interpret: bool = False,
                      nkeys: int = KEY_WORDS):
    """Merge-sort (R, 128) planes whose consecutive `run_rows`-row runs are
    each already sorted ascending: reverse odd runs to form bitonic pairs,
    then log2(R/run_rows) bitonic merge rounds.  The first `nkeys` planes
    are the sort key; extra planes (tags) ride along.  Sentinel (all-ones)
    keys sort to the back as usual."""
    r = planes[0].shape[0]
    nruns = r // run_rows
    assert r % run_rows == 0 and nruns & (nruns - 1) == 0, \
        "run count must be a power of two"
    if nruns == 1:
        return planes
    rev = []
    for p in planes:
        runs = p.reshape(nruns, run_rows * LANES)
        parity = (lax.broadcasted_iota(jnp.int32, (nruns, 1), 0) % 2) == 1
        rev.append(jnp.where(parity, runs[:, ::-1], runs).reshape(r, LANES))
    planes = rev
    lr = run_rows
    while lr < r:
        planes = _merge_round(planes, lr, interpret, nkeys)
        lr *= 2
    return planes
