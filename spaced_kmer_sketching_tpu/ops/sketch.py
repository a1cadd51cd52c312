"""FracMinHash sketch construction: filter + sort + dedup, all on device.

Replaces the reference's hash-map dedup (src/kmer.hpp:160-190) with a
TPU-native formulation: a sketch is a SORTED UNIQUE array of 128-bit keys
(4 x uint32 lanes) padded to a static capacity with all-ones sentinel rows,
plus a count.  Sorted arrays make intersection a merge instead of hash
probing and batch trivially across genomes.

On TPU, extraction + FracMinHash + per-row compaction run as one fused
Pallas kernel (ops/pallas/extract.py) and sorting is a Pallas bitonic
network (ops/pallas/sort.py); on other backends everything is pure jnp
(extract_windows + lax.sort).  The two paths are bit-identical.
"""
from __future__ import annotations

import functools
import math
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from . import u64ops
from .extract import extract_windows

# Host-side constant, NOT jnp: a module-level jnp array is committed to
# whatever backend is default at import time (the axon TPU tunnel in this
# environment), and CPU jits then fetch it per-lowering as a remote device
# constant — observed as minute-long graph lowering in the CLI.
import numpy as _np
SENTINEL = _np.uint32(0xFFFFFFFF)
KEY_WORDS = 4
_PALLAS_SORT_DISABLED = os.environ.get("SKS_DISABLE_PALLAS_SORT") == "1"


class SketchBatch(NamedTuple):
    """A batch of sketches: keys (..., cap, 4) uint32 sorted ascending with
    sentinel padding; count (...,) int32 unique keys; raw_kept (...,) int32
    pre-dedup kept windows (for capacity-overflow detection)."""
    keys: jnp.ndarray
    count: jnp.ndarray
    raw_kept: jnp.ndarray


def _sort_rows(words, extra=()):
    """Ascending multi-word lexicographic sort. `words` little-endian lanes
    (4 for full 128-bit keys; fewer when the window geometry bounds the key
    to the low words — see finish_words).

    Dispatches to the Pallas bitonic kernel on TPU (XLA's multi-operand
    comparator sort was the dominant cost of the whole sketch step: 2.5 ms
    of a 4.5 ms step at 32k rows on v5e); falls back to lax.sort on other
    backends, for ride-along operands, or for shapes the kernel rejects."""
    n = words[0].shape[0]
    kw = len(words)
    use_pallas = (not extra and jax.default_backend() == "tpu"
                  and words[0].ndim == 1 and n >= 1024
                  and (n & (n - 1)) == 0
                  and not _PALLAS_SORT_DISABLED)
    if use_pallas:
        from .pallas.sort import bitonic_sort_128
        keys = bitonic_sort_128(jnp.stack(words, axis=-1))
        return [keys[:, q] for q in range(kw)], ()
    operands = tuple(reversed(words)) + tuple(extra)
    out = lax.sort(operands, num_keys=kw)
    return list(reversed(out[:kw])), out[kw:]


def sketch_core(codes, run_id, mask_words, *, window: int, salt,
                scale: int, variant: str, capacity: int) -> SketchBatch:
    """Full single-genome sketch step: extract -> FracMinHash filter -> sort
    -> unique -> compact to `capacity`.

    codes/run_id: (n,) device arrays (see ops/extract.py).  `salt` is either
    a static python int or a traced (hi, lo) uint32 pair — the latter lets
    multi-seed sketching vmap over (mask, salt) without recompiling.
    Not jitted: compose under jit/vmap/shard_map.
    """
    if (isinstance(salt, int) and jax.default_backend() == "tpu"
            and not _PALLAS_SORT_DISABLED and codes.ndim == 1):
        from .pallas.extract import extract_filter_windows
        canon, keep = extract_filter_windows(
            codes, run_id, mask_words, window=window, salt=salt, scale=scale,
            variant=variant)
    else:
        canon, valid = extract_windows(codes, run_id, window, mask_words)
        keep = valid & u64ops.fmh_keep(*canon, salt=salt, scale=scale,
                                       variant=variant)

    return _finish_sketch(canon, keep, capacity)


def _finish_sketch(canon, keep, capacity: int) -> SketchBatch:
    """Compact kept windows -> sort -> adjacent-unique -> SketchBatch.

    Compaction: scatters serialize on TPU, full sorts are O(n log n) on
    4-word keys, and a single top_k(n, capacity) was the dominant fusion
    (1.6 ms for 2M windows) — so chunk the window axis and run a much
    cheaper per-chunk top_k with k = capacity / n_chunks.  A chunk can
    theoretically exceed its share (FracMinHash survivors are i.i.d.
    uniform, so chunk counts concentrate hard around mean); overflow is
    detected exactly and reported via raw_kept > capacity, which makes the
    caller retry at double capacity — correctness never depends on the
    concentration, only speed does."""
    src, slot_valid, raw_kept = _compact_chunked(keep, capacity)
    words = [jnp.where(slot_valid, canon[q][src], SENTINEL)
             for q in range(KEY_WORDS)]
    # sort only the small buffer to establish the sorted-unique invariant
    words, _ = _sort_rows(words)

    # adjacent-unique inside the prefix
    idx = lax.broadcasted_iota(jnp.int32, (capacity, 1), 0)[:, 0]
    neq_prev = jnp.zeros((capacity,), jnp.bool_)
    for q in range(KEY_WORDS):
        prev = jnp.roll(words[q], 1)
        neq_prev = neq_prev | (words[q] != prev)
    in_prefix = idx < raw_kept
    uniq = in_prefix & ((idx == 0) | neq_prev)

    count = jnp.sum(uniq).astype(jnp.int32)
    keys = jnp.stack(_compact_unique(words, uniq, idx), axis=-1)
    return SketchBatch(keys=keys, count=count, raw_kept=raw_kept)


def finish_words(window: int) -> int:
    """Key words that can be nonzero for valid canonical keys: spaced-seed
    masks set bits only below 2*window (utils/masks.py), so words at and
    above ceil(2*window/32) are zero for every valid key — the extract
    kernel emits only the low words and the finish carries proportionally
    less sort/compact/relayout work.  Sentinel detection on the carried
    words alone stays sound: all-ones in the carried words would need both
    strands all-ones at every care position simultaneously (window all-T
    forward AND all-A forward), which is impossible (same argument as
    ops/pallas/compact.py's sentinel note)."""
    return max(1, (2 * window + 31) // 32)


def _expand_keys(planes):
    """Reconstruct the public 4-word key layout from `kw` carried planes:
    valid rows get zero high words, sentinel rows all-ones."""
    if len(planes) >= KEY_WORDS:
        return jnp.stack(planes, axis=-1)
    sent = planes[0] == SENTINEL
    for p in planes[1:]:
        sent = sent & (p == SENTINEL)
    hi = jnp.where(sent, jnp.uint32(0xFFFFFFFF), jnp.uint32(0))
    return jnp.stack(list(planes) + [hi] * (KEY_WORDS - len(planes)),
                     axis=-1)


def slots_for_scale(scale: int) -> int:
    """Per-row (128-window) candidate slots for the compacting kernel:
    survivors per row ~ Poisson(128/scale).  The slot budget is the
    smallest power of two whose per-row overflow probability is below
    1e-7 — overflow only costs a capacity retry (detected exactly via
    rowcnt), never correctness, and the epilogue's one-hot reduction cost
    is linear in the budget, so a tighter bound directly buys kernel
    time (16 -> 8 slots at scale 200 measured ~0.3 ms/step)."""
    lam = 128.0 / scale
    k = 4
    # the Chernoff-style bound is ~1 decade loose, so -6 bounds the true
    # per-row tail near 1e-7 (scale 200: picks 8; exact P(X>8) = 2.6e-8)
    while k < 128 and _poisson_tail_log10(lam, k) > -6:
        k *= 2
    return k


def sketch_batch(codes, run_id, mask_words, *, window: int, salt: int,
                 scale: int, variant: str, capacity: int) -> SketchBatch:
    """Batched sketch step: codes/run_id (G, n) -> SketchBatch with leading
    G axis.  On TPU the whole extract+filter+compact pipeline is one Pallas
    kernel dispatch over a (G, blocks) grid (XLA lowers top_k to a full
    sort, which dominated the step; per-row in-kernel compaction removes
    it); elsewhere it is a plain vmap of sketch_core.  Not jitted: compose
    under jit/shard_map."""
    if (jax.default_backend() == "tpu" and not _PALLAS_SORT_DISABLED
            and codes.ndim == 2):
        return _sketch_batch_pallas(codes, run_id, mask_words, salt,
                                    window=window, scale=scale,
                                    variant=variant, capacity=capacity)
    fn = functools.partial(sketch_core, window=window, salt=salt, scale=scale,
                           variant=variant, capacity=capacity)
    return jax.vmap(fn, in_axes=(0, 0, None))(codes, run_id, mask_words)


def _k_slots_for(nw: int, scale: int, capacity: int) -> int:
    """Per-row candidate slots: k_slots also grows with capacity so the
    overflow->retry loop terminates even on adversarial inputs (e.g. a
    surviving k-mer repeated across a whole row): at k_slots=128 overflow
    is impossible (a row has only 128 windows)."""
    rows = max(1, (nw + 127) // 128)
    grow = 1 << max(0, (4 * capacity // rows - 1).bit_length())
    return min(128, max(slots_for_scale(scale), grow))


def _sketch_batch_pallas(codes, run_id, mask_words, salt, *, window: int,
                         scale: int, variant: str, capacity: int,
                         interpret: bool = False) -> SketchBatch:
    """TPU path shared by genome batches (one mask broadcast) and fused
    multi-seed (per-element masks/salts)."""
    from .pallas.extract import extract_compact_windows_batched

    nw = codes.shape[1] - window + 1
    k_slots = _k_slots_for(nw, scale, capacity)
    words, rowcnt, _ = extract_compact_windows_batched(
        codes, run_id, mask_words, window=window, salt=salt, scale=scale,
        variant=variant, k_slots=k_slots, out_words=finish_words(window),
        interpret=interpret)
    return _finish_dispatch(words, rowcnt, nw, k_slots, capacity, scale,
                            interpret)


def sketch_batch_packed(qc, qr, rid, mask_words, *, n: int, window: int,
                        salt, scale: int, variant: str, capacity: int,
                        batch: int = 0,
                        interpret: bool = False) -> SketchBatch:
    """Batched sketch step on HOST-prepacked genome planes (see
    ops/pallas/extract.pack_genomes_np): the hot-loop entry for ingest
    pipelines and the benchmark — packing is window/mask-independent and
    hoisted to upload time, so a 62-config sweep re-reads one upload.

    batch=S with single-row planes + (S, 4)/(S, 2) mask/salt runs the
    fused multi-seed form: S seeds over ONE genome whose planes are read
    shared from HBM (BASELINE config 3)."""
    from .pallas.extract import extract_compact_windows_prepacked

    nw = n - window + 1
    k_slots = _k_slots_for(nw, scale, capacity)
    words, rowcnt, _ = extract_compact_windows_prepacked(
        qc, qr, rid, mask_words, nw=nw, window=window, salt=salt,
        scale=scale, variant=variant, k_slots=k_slots,
        out_words=finish_words(window), batch=batch, interpret=interpret)
    return _finish_dispatch(words, rowcnt, nw, k_slots, capacity, scale,
                            interpret)


@functools.lru_cache(maxsize=128)
def jitted_sketch_batch_packed(n: int, window: int, salt: int, scale: int,
                               variant: str, capacity: int):
    return jax.jit(functools.partial(
        sketch_batch_packed, n=n, window=window, salt=salt, scale=scale,
        variant=variant, capacity=capacity))


def sketch_batch_packed_dyn(qc, qr, rid, mask_words, salt_pair, window_arr,
                            *, n: int, kw: int, scale: int, variant: str,
                            capacity: int,
                            interpret: bool = False) -> SketchBatch:
    """SHARED sweep-bucket sketch step: window, mask and salt are all
    runtime OPERANDS, so every (window, k) config whose key-word count
    (finish_words) and capacity agree reuses ONE compiled program — a
    62-config reference sweep traces/loads ~4 distinct executables
    instead of 62 (the measured per-config cost was ~0.9 s Python
    tracing + executable load, BASELINE_RESULTS.md).

    Correctness is window-independent by construction: the kernel's only
    window dependences are slide offsets (dynamic rolls), per-lane shift
    amounts, and the mask AND (mask words past ceil(2*window/32) are
    zero); window validity near run ends falls out of the run-id compare
    (rid[t] == rid[t + window - 1]), so the program's static window-count
    upper bound nw_prog covers every window in the bucket.

    salt_pair (2,) uint32 [hi, lo]; window_arr (1,) uint32."""
    g = qc.shape[0]
    w_min = 16 * (kw - 1) + 1         # smallest window with finish_words=kw
    nw_prog = n - w_min + 1
    k_slots = _k_slots_for(nw_prog, scale, capacity)
    salts = jnp.broadcast_to(
        jnp.concatenate([salt_pair.astype(jnp.uint32),
                         window_arr.astype(jnp.uint32)])[None, :], (g, 3))
    from .pallas.extract import extract_compact_windows_prepacked
    words, rowcnt, _ = extract_compact_windows_prepacked(
        qc, qr, rid, mask_words, nw=nw_prog, window=None, salt=salts,
        scale=scale, variant=variant, k_slots=k_slots, out_words=kw,
        interpret=interpret)
    return _finish_dispatch(words, rowcnt, nw_prog, k_slots, capacity,
                            scale, interpret)


@functools.lru_cache(maxsize=32)
def jitted_sketch_batch_packed_dyn(n: int, kw: int, scale: int, variant: str,
                                   capacity: int):
    return jax.jit(functools.partial(
        sketch_batch_packed_dyn, n=n, kw=kw, scale=scale, variant=variant,
        capacity=capacity))


@functools.lru_cache(maxsize=32)
def jitted_sketch_multiseed_packed(n: int, window: int, scale: int,
                                   variant: str, capacity: int):
    """Jitted multi-seed step on shared prepacked planes: (qc, qr, rid)
    single-genome planes + (S, 4) masks + (S, 2) salt pairs -> SketchBatch
    with a leading S axis (S read from the mask shape at trace time)."""
    def fn(qc, qr, rid, mask_words, salt_pairs):
        return sketch_batch_packed(
            qc, qr, rid, mask_words, n=n, window=window, salt=salt_pairs,
            scale=scale, variant=variant, capacity=capacity,
            batch=mask_words.shape[0])
    return jax.jit(fn)


def sketch_batch_compact(p, bounds, rid0, valid_len, mask_words, *, n: int,
                         window: int, salt, scale: int, variant: str,
                         capacity: int,
                         interpret: bool = False) -> SketchBatch:
    """Sketch step from COMPACT uploads, for streaming/ingest paths where
    host packing and transfer dominate: p (G, body/16) uint32 raw 2-bit
    packed codes (16 per word LSB-first, utils/native.pack2bit — positions
    past the genome packed as code 0), bounds (G, K) int32 sorted interior
    run-start positions (padded with body, which never triggers), rid0
    (G,) int32 id of the run open at position 0, valid_len (G,) int32 real
    code count.

    Default path: the raw-plane kernel (ops/pallas/extract.
    extract_compact_windows_raw) reads the 2-bit words directly and
    expands them in VMEM (16x less DMA than the expanded planes, and none
    of the ~12-15 ms/dispatch of XLA pad/copy expansion passes the
    measured trace attributed to the old formulation); run ids come
    arithmetically from the bounds in SMEM.  SKS_COMPACT_EXPAND=xla
    selects the original XLA expansion (repeat to window space + rid
    plane) feeding the prepacked kernel — both bit-identical.  Measured
    on the 16M-nt streaming segment: the full host-plane path paid 5.6 s
    numpy pack + 3.5 s of 400 MB upload against 0.09 s of device work;
    the compact upload is ~8 MB."""
    from .pallas.extract import packed_body

    g, pw = p.shape
    body = pw * 16
    assert body == packed_body(n), (body, packed_body(n))
    nw = n - window + 1
    k_slots = _k_slots_for(nw, scale, capacity)

    # bounds ride SMEM in the raw kernel; huge g x K batches fall back
    raw_ok = (os.environ.get("SKS_COMPACT_EXPAND", "kernel") != "xla"
              and g * bounds.shape[1] <= 4096)
    if raw_ok:
        from .pallas.extract import extract_compact_windows_raw
        words, rowcnt, _ = extract_compact_windows_raw(
            p, bounds, rid0, valid_len, mask_words, nw=nw, window=window,
            salt=salt, scale=scale, variant=variant, k_slots=k_slots,
            out_words=finish_words(window), interpret=interpret)
        return _finish_dispatch(words, rowcnt, nw, k_slots, capacity, scale,
                                interpret)

    from .bitops import _rev32_2bit
    from .pallas.extract import (_LEAD, LANES,
                                 extract_compact_windows_prepacked)

    lead32 = jnp.zeros((g, _LEAD), jnp.uint32)
    qc = jnp.concatenate([lead32, jnp.repeat(~p, 16, axis=1)], axis=1)
    qr = jnp.concatenate([lead32, jnp.repeat(_rev32_2bit(p), 16, axis=1)],
                         axis=1)
    pos = lax.broadcasted_iota(jnp.int32, (g, body), 1)
    r = jnp.broadcast_to(rid0[:, None].astype(jnp.int32), (g, body))
    for kk in range(bounds.shape[1]):
        r = r + (pos >= bounds[:, kk][:, None]).astype(jnp.int32)
    r = jnp.where(pos < valid_len[:, None], r, jnp.int32(-1))
    rid = jnp.concatenate([jnp.full((g, _LEAD), -1, jnp.int32), r], axis=1)

    words, rowcnt, _ = extract_compact_windows_prepacked(
        qc.reshape(g, -1, LANES), qr.reshape(g, -1, LANES),
        rid.reshape(g, -1, LANES), mask_words, nw=nw, window=window,
        salt=salt, scale=scale, variant=variant, k_slots=k_slots,
        out_words=finish_words(window), interpret=interpret)
    return _finish_dispatch(words, rowcnt, nw, k_slots, capacity, scale,
                            interpret)


@functools.lru_cache(maxsize=128)
def jitted_sketch_batch_compact(n: int, window: int, salt: int, scale: int,
                                variant: str, capacity: int):
    return jax.jit(functools.partial(
        sketch_batch_compact, n=n, window=window, salt=salt, scale=scale,
        variant=variant, capacity=capacity))


def _finish_dispatch(words, rowcnt, nw: int, k_slots: int, capacity: int,
                     scale: int, interpret: bool) -> SketchBatch:
    from .pallas.extract import BLOCK

    g = words[0].shape[0]
    m = words[0].shape[1]
    if (capacity >= 1024 and m % 128 == 0
            and _tree_chain(m, 128.0 / k_slots, scale, capacity, g)
            is not None):
        return _finish_tree(list(words), rowcnt, k_slots, capacity, scale,
                            interpret=interpret)

    nblocks = (nw + BLOCK - 1) // BLOCK
    npb = 1 << max(0, (nblocks - 1).bit_length())  # runs padded to pow2
    run_elems = (BLOCK // 128) * k_slots           # candidates per block
    out_elems = capacity // npb if npb else 0
    if (nblocks >= 2 and 128 <= out_elems <= run_elems
            and capacity % npb == 0 and out_elems % 128 == 0):
        def finish(*args):
            return _finish_runs(list(args[:-1]), args[-1], k_slots, nblocks,
                                run_elems, out_elems, capacity, interpret)
        return jax.vmap(finish)(*words, rowcnt)

    def finish(*args):
        return _finish_candidates(list(args[:-1]), args[-1], k_slots,
                                  capacity)
    return jax.vmap(finish)(*words, rowcnt)


def _poisson_tail_log10(lam: float, k: int) -> float:
    """log10 P(Poisson(lam) > k), Chernoff-ish upper bound (exact enough to
    pick slot counts; no scipy in this image)."""
    import math
    if lam <= 0:
        return -300.0
    if k <= lam:
        return 0.0
    # P(X > k) <= exp(-lam) (e*lam/(k+1))^(k+1)
    k1 = k + 1
    return (-lam + k1 * (1 + math.log(lam / k1))) / math.log(10)


def _tree_chain(m: int, windows_per_slot: float, scale: int, capacity: int,
                batch: int):
    """Plan the compaction chain: [(rows, k_out), ...] shrinking an m-slot
    candidate array (each slot covering `windows_per_slot` windows on
    average) until it fits `capacity`.  Returns None when no useful chain
    exists (fallback to the sort-everything paths)."""
    stages = []
    wps = windows_per_slot
    # headroom grows with a caller-doubled capacity so overflow retries
    # monotonically relax the per-row slot budgets (auto mirrors
    # config.SketchConfig.capacity_for)
    expect = max(1, int(m * wps / scale))
    auto = 1 << max(8, math.ceil(math.log2(expect * 2 + 256)))
    headroom = max(1, capacity // auto)
    while m > capacity and m % LANES_ == 0:
        rows = m // LANES_
        lam = LANES_ * wps / scale
        k_out = 8
        while k_out < LANES_ and (
                _poisson_tail_log10(lam, k_out) + math.log10(rows * batch + 1)
                > -9):
            k_out *= 2
        k_out = min(LANES_, k_out * headroom)
        if k_out >= LANES_:
            break
        stages.append((rows, k_out))
        m = rows * k_out
        wps = LANES_ * wps / k_out
    # the chain output only feeds a cheap butterfly hole-close (the real
    # sort runs over a statically expected-count-sized front window), so a
    # chain is useful whenever it shrank the candidates meaningfully; the
    # old 2x-capacity bail sent the config-4 pipeline shape (m = 6*cap,
    # one 64-slot stage -> m = 3*cap) to _finish_runs, measured ~20%
    # slower per window than the tree finish on identical inputs (r5)
    return stages if m <= 4 * capacity else None


LANES_ = 128


def _finish_tree(words, rowcnt, k_slots: int, capacity: int, scale: int,
                 interpret: bool = False) -> SketchBatch:
    """Tree-compaction finish: repeatedly fold the sentinel-sparse candidate
    array (G, m) into (G, m/128, 128) rows and compact each row's valid
    slots to the front (ops/pallas/compact.py), then ONE bitonic sort at
    `capacity` + adjacent-unique.  Replaces the per-run sort + merge-round
    cascade, which spent most of its time sorting sentinel fill.

    Key drops (a row exceeding its slot budget) are detected EXACTLY by
    valid-count conservation: the kernel drops keys only by compaction
    overflow, so post-chain valid slots != sum(min(rowcnt, k_slots)) iff a
    drop happened; the caller then retries at doubled capacity.  Batched:
    words 4 x (G, m), rowcnt (G, rows)."""
    from .pallas.compact import compact_rows

    g, m = words[0].shape
    kw = len(words)
    rows = rowcnt.shape[1]
    stages = _tree_chain(m, 128.0 / k_slots, scale, capacity, g)
    assert stages is not None

    planes = [w for w in words]
    rc_last = None
    for si, (srows, k_out) in enumerate(stages):
        planes = [p.reshape(g, srows, LANES_) for p in planes]
        last = si == len(stages) - 1
        out = compact_rows(planes, k_out, interpret=interpret,
                           with_counts=last)
        if last:
            planes, rc_last = out
        else:
            planes = out
        planes = [p.reshape(g, srows * k_out) for p in planes]
    mf = planes[0].shape[1]

    # valid-count conservation (exact drop detection): the last compact
    # stage emits its per-row output counts, so kept_after is a tiny
    # (G, R) sum instead of a sentinel sweep over the whole candidate
    # array (the sweep measured ~1 ms/dispatch as an XLA reduce, r5)
    if rc_last is not None:
        kept_after = jnp.sum(rc_last, axis=1).astype(jnp.int32)   # (G,)
    else:
        sent = jnp.uint32(SENTINEL)
        still = planes[0] != sent
        for p in planes[1:]:
            still = still | (p != sent)
        kept_after = jnp.sum(still, axis=1).astype(jnp.int32)     # (G,)

    mp = 1 << (max(mf, capacity) - 1).bit_length()   # sort size (pow2)
    if mf < mp:
        fill = jnp.full((g, mp - mf), SENTINEL, jnp.uint32)
        planes = [jnp.concatenate([p, fill], axis=1) for p in planes]

    # survivors are sparse in the compacted chain output (~m*wps/scale of mp
    # slots): close the holes with the order-preserving butterfly, then sort
    # only a front window that statically covers the expected count with
    # 6-sigma headroom — sorting the full capacity buffer spent most of the
    # bitonic on sentinel fill.  A kept count exceeding the window is
    # detected exactly below and resolves through the capacity retry.
    expect2 = max(1, int(m * (128.0 / k_slots) / scale))
    want = expect2 + 6 * int(math.sqrt(expect2)) + 256
    sort_m = 1 << max(10, (want - 1).bit_length())
    sort_m = min(sort_m, mp)
    if sort_m < mp:
        from .pallas.compact import compact_global
        planes = compact_global(planes, interpret=interpret)
        planes = [p[:, :sort_m] for p in planes]

    def one(*args):
        w, (rc, ka) = args[:kw], args[kw:]
        buf, _ = _sort_rows(list(w))
        if sort_m >= capacity:
            buf = [x[:capacity] for x in buf]
        else:
            tailf = jnp.full((capacity - sort_m,), SENTINEL, jnp.uint32)
            buf = [jnp.concatenate([x, tailf]) for x in buf]
        rcl = jnp.minimum(rc, k_slots)
        valid_total = jnp.sum(rcl).astype(jnp.int32)
        total = jnp.sum(rc).astype(jnp.int32)
        overflow = (jnp.any(rc > k_slots) | (ka != valid_total)
                    | (ka > sort_m))
        raw_kept = jnp.where(
            overflow, jnp.maximum(total, jnp.int32(capacity + 1)), total)
        idx = lax.broadcasted_iota(jnp.int32, (capacity, 1), 0)[:, 0]
        neq_prev = jnp.zeros((capacity,), jnp.bool_)
        for q in range(kw):
            neq_prev = neq_prev | (buf[q] != jnp.roll(buf[q], 1))
        uniq = (idx < jnp.minimum(valid_total, capacity)) & \
            ((idx == 0) | neq_prev)
        count = jnp.sum(uniq).astype(jnp.int32)
        bufm = [jnp.where(uniq, x, SENTINEL) for x in buf]
        return (*bufm, count, raw_kept)

    *bufm, count, raw_kept = jax.vmap(one)(*planes, rowcnt, kept_after)
    # survivors are already sorted; close the duplicate holes with the
    # order-preserving butterfly instead of a second full bitonic sort
    from .pallas.compact import compact_global
    keys = _expand_keys(compact_global(list(bufm), interpret=interpret))
    return SketchBatch(keys=keys, count=count, raw_kept=raw_kept)


def _finish_runs(words, rowcnt, k_slots: int, nblocks: int, run_elems: int,
                 out_elems: int, capacity: int,
                 interpret: bool = False) -> SketchBatch:
    """Finish for per-block candidate runs: sort each block's candidates
    (small alternating-direction bitonic runs — ~scale x less sort work
    than sorting the whole sentinel-dominated candidate array), truncate
    every run to its out_elems capacity share, bitonic-merge into one
    ascending array, then adjacent-unique + recompact.  Truncation drops
    valid keys only when a block held more than its share — detected via
    the per-row counts and resolved by the caller's capacity retry."""
    from .pallas.sort import _merge_round, sort_runs_128

    m = words[0].shape[0]                     # nblocks * run_elems
    kw = len(words)
    run_rows = run_elems // 128
    planes = [w.reshape(m // 128, 128) for w in words]
    planes = sort_runs_128(planes, run_rows, interpret)

    # truncate: ascending runs keep their head, descending runs their tail
    parity = (lax.broadcasted_iota(jnp.int32, (nblocks, 1), 0) % 2) == 1
    trunc = []
    for p in planes:
        runs = p.reshape(nblocks, run_elems)
        head = runs[:, :out_elems]
        tail = runs[:, run_elems - out_elems:]
        trunc.append(jnp.where(parity, tail, head).reshape(
            nblocks * out_elems))

    npb = 1 << max(0, (nblocks - 1).bit_length())
    if npb * out_elems > nblocks * out_elems:
        fill = jnp.full((npb * out_elems - nblocks * out_elems,), SENTINEL)
        trunc = [jnp.concatenate([w, fill]) for w in trunc]

    planes = [w.reshape(capacity // 128, 128) for w in trunc]
    lr = out_elems // 128
    while lr < capacity // 128:
        planes = _merge_round(planes, lr, interpret, nkeys=kw)
        lr *= 2
    buf = [p.reshape(capacity) for p in planes]

    rows = rowcnt.shape[0]
    rcl = jnp.minimum(rowcnt, k_slots)
    valid_total = jnp.sum(rcl).astype(jnp.int32)
    total = jnp.sum(rowcnt).astype(jnp.int32)
    rows_per_block = 256
    nb = rows // rows_per_block
    block_valid = jnp.sum(rcl[:nb * rows_per_block].reshape(
        nb, rows_per_block), axis=1)
    overflow = (jnp.any(rowcnt > k_slots)
                | jnp.any(block_valid > out_elems))
    raw_kept = jnp.where(overflow,
                         jnp.maximum(total, jnp.int32(capacity + 1)), total)

    idx = lax.broadcasted_iota(jnp.int32, (capacity, 1), 0)[:, 0]
    neq_prev = jnp.zeros((capacity,), jnp.bool_)
    for q in range(kw):
        neq_prev = neq_prev | (buf[q] != jnp.roll(buf[q], 1))
    uniq = (idx < jnp.minimum(valid_total, capacity)) & \
        ((idx == 0) | neq_prev)
    count = jnp.sum(uniq).astype(jnp.int32)
    keys = _expand_keys(_compact_unique(buf, uniq, idx))
    return SketchBatch(keys=keys, count=count, raw_kept=raw_kept)


@functools.lru_cache(maxsize=128)
def jitted_sketch_batch(window: int, salt: int, scale: int, variant: str,
                        capacity: int):
    """Cached jitted sketch_batch for a static config (callers construct
    partials per call; caching here keeps XLA's jit cache effective)."""
    return jax.jit(functools.partial(sketch_batch, window=window, salt=salt,
                                     scale=scale, variant=variant,
                                     capacity=capacity))


def _finish_candidates(words, rowcnt, k_slots: int, capacity: int
                       ) -> SketchBatch:
    """Gather the valid candidate slots into the capacity buffer (branchless
    binary search over the per-row count cumsum — the candidate array is
    ~scale x larger than the survivors, so sorting it directly wastes most
    of the sort on sentinel fill), then sort + adjacent-unique + recompact.

    `rowcnt` carries TRUE per-row survivor counts: a row overflowing its
    k_slots bumps raw_kept past capacity, making the caller retry at a
    doubled capacity (which also raises k_slots, so the retry terminates
    even on adversarial repeat-heavy input)."""
    from .pallas.sort import TILE_ELEMS, sort_truncate_128

    rows = rowcnt.shape[0]
    kw = len(words)
    rcl = jnp.minimum(rowcnt, k_slots)
    valid_total = jnp.sum(rcl).astype(jnp.int32)
    m = words[0].shape[0]

    # pad the candidate array to a power-of-two number of sort tiles
    t = max(1, m // TILE_ELEMS)
    t = 1 << (t - 1).bit_length()
    mp = t * TILE_ELEMS
    if mp > m:
        fill = jnp.full((mp - m,), SENTINEL)
        words = [jnp.concatenate([w, fill]) for w in words]

    overflow = jnp.any(rowcnt > k_slots)
    if t >= 2 and capacity // t >= 128 and capacity <= mp:
        # per-tile sort + truncate-to-share + merge; a tile holding more
        # valid candidates than its capacity/t share triggers a retry
        rows_per_tile = TILE_ELEMS // k_slots
        rcl_p = jnp.concatenate(
            [rcl, jnp.zeros((t * rows_per_tile - rows,), rcl.dtype)]) \
            if t * rows_per_tile != rows else rcl
        tile_valid = jnp.sum(rcl_p.reshape(t, rows_per_tile), axis=1)
        overflow = overflow | jnp.any(tile_valid > capacity // t)
        keys4 = sort_truncate_128(jnp.stack(words, axis=-1), capacity)
        buf = [keys4[:, q] for q in range(kw)]
    else:
        buf, _ = _sort_rows(words)
        if mp >= capacity:
            buf = [w[:capacity] for w in buf]
        else:
            tail = jnp.full((capacity - mp,), SENTINEL)
            buf = [jnp.concatenate([w, tail]) for w in buf]

    total = jnp.sum(rowcnt).astype(jnp.int32)
    raw_kept = jnp.where(overflow,
                         jnp.maximum(total, jnp.int32(capacity + 1)), total)

    idx = lax.broadcasted_iota(jnp.int32, (capacity, 1), 0)[:, 0]
    neq_prev = jnp.zeros((capacity,), jnp.bool_)
    for q in range(kw):
        neq_prev = neq_prev | (buf[q] != jnp.roll(buf[q], 1))
    uniq = (idx < jnp.minimum(valid_total, capacity)) & \
        ((idx == 0) | neq_prev)
    count = jnp.sum(uniq).astype(jnp.int32)
    keys = _expand_keys(_compact_unique(buf, uniq, idx))
    return SketchBatch(keys=keys, count=count, raw_kept=raw_kept)


_CHUNK_WINDOWS = 32768


def _compact_chunked(keep, capacity: int):
    """Indices of kept windows, compacted chunk-locally.

    Splits the window axis into power-of-two chunks and takes the first
    (capacity / n_chunks) kept positions of each with a per-chunk top_k.
    Returns (src (capacity,) int32 indices into keep, slot_valid
    (capacity,) bool, raw_kept int32) where raw_kept > capacity signals the
    caller to retry with a larger capacity — either a true global overflow
    or a chunk exceeding its share."""
    nw = keep.shape[0]
    ch = max(1, min(nw // _CHUNK_WINDOWS,
                    capacity // 256 if capacity >= 256 else 1))
    ch = 1 << (ch.bit_length() - 1)              # power of two
    k = capacity // ch
    csz = (nw + ch - 1) // ch
    pad = ch * csz - nw
    keep_p = jnp.concatenate([keep, jnp.zeros((pad,), keep.dtype)]) \
        if pad else keep
    grid = keep_p.reshape(ch, csz)

    pos = lax.broadcasted_iota(jnp.int32, (ch, csz), 1)
    rank = jnp.where(grid, pos, jnp.int32(0x7FFFFFFF))
    kk = min(k, csz)                             # tiny inputs: chunk < share
    neg, idx = lax.top_k(-rank, kk)              # (ch, kk), ascending rank
    valid = neg != -0x7FFFFFFF
    base = lax.broadcasted_iota(jnp.int32, (ch, kk), 0) * csz
    src = (idx + base).reshape(ch * kk)
    slot_valid = valid.reshape(ch * kk)
    if ch * kk < capacity:
        fill = capacity - ch * kk
        src = jnp.concatenate([src, jnp.zeros((fill,), jnp.int32)])
        slot_valid = jnp.concatenate(
            [slot_valid, jnp.zeros((fill,), jnp.bool_)])

    counts = jnp.sum(grid, axis=1).astype(jnp.int32)
    total = jnp.sum(counts)
    overflow = jnp.any(counts > kk)
    raw_kept = jnp.where(overflow,
                         jnp.maximum(total, jnp.int32(capacity + 1)), total)
    return jnp.minimum(src, nw - 1), slot_valid, raw_kept


def _compact_unique(words, uniq, idx):
    """Compact rows flagged `uniq` to the front, preserving sorted order:
    sentinel the duplicates and re-sort the (small) capacity buffer.  On
    TPU the sort is the Pallas bitonic kernel; top_k is avoided everywhere
    on the hot path because XLA lowers it to a full sort."""
    del idx
    words = [jnp.where(uniq, w, SENTINEL) for w in words]
    words, _ = _sort_rows(words)
    return words


@functools.partial(jax.jit, static_argnames=("window", "salt", "scale",
                                             "variant", "capacity"))
def sketch_from_codes(codes, run_id, mask_words, *, window: int, salt: int,
                      scale: int, variant: str, capacity: int) -> SketchBatch:
    """Jitted single-genome sketch step (static salt)."""
    return sketch_core(codes, run_id, mask_words, window=window, salt=salt,
                       scale=scale, variant=variant, capacity=capacity)


@functools.lru_cache(maxsize=64)
def jitted_merge_sketches(capacity: int):
    """Cached jitted merge_sketches — eager composition dispatches every
    sort round as its own device program (~17 ms each through the TPU
    tunnel), so host-driven callers (streaming accumulation) jit it."""
    return jax.jit(functools.partial(merge_sketches, capacity=capacity))


def merge_sketches(keys, counts, capacity: int) -> SketchBatch:
    """Merge S sorted-unique sketches into one: keys (S, cap, 4) uint32,
    counts (S,) int32 -> SketchBatch with `capacity` rows.

    Used to combine per-chunk sketches from sequence-parallel extraction and
    per-chip partial sketches in the multi-host path.  Not jitted: compose
    under jit/shard_map.
    """
    s, cap = keys.shape[0], keys.shape[1]
    n = s * cap
    flat = keys.reshape(n, KEY_WORDS)
    idx_in = lax.broadcasted_iota(jnp.int32, (s, cap), 1)
    valid = (idx_in < counts[:, None]).reshape(n)
    words = [jnp.where(valid, flat[:, q], SENTINEL) for q in range(KEY_WORDS)]
    total = jnp.sum(counts).astype(jnp.int32)

    words, _ = _sort_rows(words)
    if n < capacity:
        pad = jnp.full((capacity - n,), SENTINEL)
        words = [jnp.concatenate([w, pad]) for w in words]
    else:
        words = [w[:capacity] for w in words]
    idx = lax.broadcasted_iota(jnp.int32, (capacity, 1), 0)[:, 0]
    neq_prev = jnp.zeros((capacity,), jnp.bool_)
    for q in range(KEY_WORDS):
        neq_prev = neq_prev | (words[q] != jnp.roll(words[q], 1))
    uniq = (idx < total) & ((idx == 0) | neq_prev)
    count = jnp.sum(uniq).astype(jnp.int32)
    keys = jnp.stack(_compact_unique(words, uniq, idx), axis=-1)
    return SketchBatch(keys=keys, count=count, raw_kept=total)


@functools.partial(jax.jit, static_argnames=("window", "scale", "variant",
                                             "capacity"))
def sketch_from_codes_multiseed(codes, run_id, masks_words, salt_pairs, *,
                                window: int, scale: int, variant: str,
                                capacity: int) -> SketchBatch:
    """Fused multi-seed sketching: S spaced seeds evaluated over one genome
    in a single compiled program (the EP analog of SURVEY.md §2.1 — "experts"
    = seeds, all dense; BASELINE.json config 3).

    masks_words: (S, 4) uint32; salt_pairs: (S, 2) uint32 [hi, lo] rows.
    Returns a SketchBatch with a leading S axis.  On TPU all seeds ride the
    Pallas kernel's batch grid axis in one dispatch (per-seed mask/salt from
    SMEM); elsewhere a vmap over sketch_core.
    """
    s = masks_words.shape[0]
    if (jax.default_backend() == "tpu" and not _PALLAS_SORT_DISABLED
            and codes.ndim == 1):
        # pack the genome ONCE (packing is mask/salt-independent) and let
        # every seed row of the kernel grid read the same shared planes —
        # broadcasting codes to (S, n) re-packed the identical genome S
        # times inside the jit (measured ~35% of the multiseed step)
        from .pallas.extract import _pad_batch_packed
        qc2, qr2, rid2, nw, _ = _pad_batch_packed(codes[None], run_id[None],
                                                  window)
        return sketch_batch_packed(qc2, qr2, rid2, masks_words,
                                   n=codes.shape[0], window=window,
                                   salt=salt_pairs, scale=scale,
                                   variant=variant, capacity=capacity,
                                   batch=s)

    def one(mask_w, sp):
        return sketch_core(codes, run_id, mask_w, window=window,
                           salt=(sp[0], sp[1]), scale=scale, variant=variant,
                           capacity=capacity)
    return jax.vmap(one)(masks_words, salt_pairs)
