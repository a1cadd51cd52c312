"""Pallas fused extract kernels (interpret mode) vs the jnp reference path."""
import numpy as np
import pytest

import jax.numpy as jnp

from spaced_kmer_sketching_tpu.ops import u64ops
from spaced_kmer_sketching_tpu.ops.extract import (extract_windows,
                                                   run_ids_from_lens)
from spaced_kmer_sketching_tpu.ops.pallas.extract import (
    extract_compact_windows_batched, extract_filter_windows_batched)
from spaced_kmer_sketching_tpu.utils import boosthash
from spaced_kmer_sketching_tpu.utils.masks import spaced_seed_mask


def ref_keep(codes, rid, mask, window, salt, scale, variant="modern"):
    canon, valid = extract_windows(jnp.asarray(codes), jnp.asarray(rid),
                                   window, jnp.asarray(mask.words_u32))
    keep = valid & u64ops.fmh_keep(*canon, salt=salt, scale=scale,
                                   variant=variant)
    return [np.asarray(c) for c in canon], np.asarray(keep)


def setup(window, k, scale, n, seed=0, runs=None):
    mask = spaced_seed_mask(window, k, seed)
    salt = boosthash.fmh_salt(mask.lo, mask.hi, window, 1, "modern")
    rng = np.random.default_rng(seed + n)
    codes = rng.integers(0, 4, n).astype(np.uint32)
    rid = run_ids_from_lens(runs or [n], n)
    return mask, salt, codes, rid


@pytest.mark.parametrize("window,k,scale,n",
                         [(20, 16, 20, 6000), (31, 17, 5, 4096)])
def test_filter_kernel_matches_reference(window, k, scale, n):
    mask, salt, codes, rid = setup(window, k, scale, n,
                                   runs=[n // 3, n - n // 3])
    canon_r, keep_r = ref_keep(codes, rid, mask, window, salt, scale)
    canon_p, keep_p = extract_filter_windows_batched(
        jnp.asarray(codes)[None], jnp.asarray(rid)[None],
        jnp.asarray(mask.words_u32), window=window, salt=salt, scale=scale,
        variant="modern", interpret=True)
    np.testing.assert_array_equal(np.asarray(keep_p[0]), keep_r)
    m = keep_r
    for a, b in zip(canon_p, canon_r):
        np.testing.assert_array_equal(np.asarray(a[0])[m], b[m])


@pytest.mark.parametrize("window,k,scale,n,k_slots",
                         [(20, 16, 20, 6000, 32), (16, 12, 5, 4096, 64)])
def test_compact_kernel_emits_exact_survivors(window, k, scale, n, k_slots):
    mask, salt, codes, rid = setup(window, k, scale, n, runs=[n // 2, n - n // 2])
    canon_r, keep_r = ref_keep(codes, rid, mask, window, salt, scale)

    words, rowcnt, nw = extract_compact_windows_batched(
        jnp.asarray(codes)[None], jnp.asarray(rid)[None],
        jnp.asarray(mask.words_u32), window=window, salt=salt, scale=scale,
        variant="modern", k_slots=k_slots, interpret=True)
    assert nw == n - window + 1

    # expected multiset of survivor keys (as 128-bit ints)
    want = sorted((int(canon_r[0][i]) | int(canon_r[1][i]) << 32
                   | int(canon_r[2][i]) << 64 | int(canon_r[3][i]) << 96)
                  for i in np.flatnonzero(keep_r))
    w = [np.asarray(x[0], dtype=np.uint64) for x in words]
    got = []
    rc = np.asarray(rowcnt[0])
    assert (rc <= k_slots).all(), "test sized k_slots to avoid overflow"
    for r in range(rc.size):
        for s in range(rc[r]):
            i = r * k_slots + s
            got.append(int(w[0][i]) | int(w[1][i]) << 32
                       | int(w[2][i]) << 64 | int(w[3][i]) << 96)
    assert sorted(got) == want
    # per-row counts must reproduce the global keep count
    assert rc.sum() == keep_r.sum()


def test_compact_kernel_overflow_rows_report_true_counts():
    # poly-A region: every window identical; if that key survives the hash
    # the whole row keeps -> rowcnt = 128 regardless of k_slots
    window, k = 12, 8
    mask = spaced_seed_mask(window, k, 0)
    salt = boosthash.fmh_salt(mask.lo, mask.hi, window, 1, "modern")
    n = 2048
    codes = np.zeros(n, np.uint32)          # all A
    rid = run_ids_from_lens([n], n)
    _, keep_r = ref_keep(codes, rid, mask, window, salt, 1)  # scale 1: keep all
    words, rowcnt, _ = extract_compact_windows_batched(
        jnp.asarray(codes)[None], jnp.asarray(rid)[None],
        jnp.asarray(mask.words_u32), window=window, salt=salt, scale=1,
        variant="modern", k_slots=8, interpret=True)
    rc = np.asarray(rowcnt[0])
    assert rc.sum() == keep_r.sum()          # true counts, not clamped
    assert (rc > 8).any()                    # overflow visible to caller


def test_sketch_batch_pallas_interpret_end_to_end():
    """Full TPU sketch path (block-sorted kernel + merge finish) in
    interpret mode vs the portable vmap(sketch_core) path."""
    import functools
    import jax
    from spaced_kmer_sketching_tpu.ops.sketch import (_sketch_batch_pallas,
                                                      sketch_core)
    window, k, scale, cap = 20, 16, 40, 4096
    mask = spaced_seed_mask(window, k, 0)
    salt = boosthash.fmh_salt(mask.lo, mask.hi, window, 1, "modern")
    rng = np.random.default_rng(3)
    G, n = 2, 70000                       # ~3 blocks -> padded to 4 runs
    codes = rng.integers(0, 4, (G, n)).astype(np.uint32)
    rid = np.stack([run_ids_from_lens([n // 2, n - n // 2], n)] * G)
    mw = jnp.asarray(mask.words_u32)

    got = _sketch_batch_pallas(jnp.asarray(codes), jnp.asarray(rid), mw,
                               salt, window=window, scale=scale,
                               variant="modern", capacity=cap,
                               interpret=True)
    fn = functools.partial(sketch_core, window=window, salt=salt,
                           scale=scale, variant="modern", capacity=cap)
    want = jax.vmap(fn, in_axes=(0, 0, None))(
        jnp.asarray(codes), jnp.asarray(rid), mw)
    assert int(np.asarray(want.raw_kept).max()) <= cap
    np.testing.assert_array_equal(np.asarray(got.count),
                                  np.asarray(want.count))
    np.testing.assert_array_equal(np.asarray(got.keys),
                                  np.asarray(want.keys))


def test_compact_rows_interpret():
    """compact_rows moves each row's non-sentinel slots to the front
    (order preserved), sentinel-fills the rest."""
    from spaced_kmer_sketching_tpu.ops.pallas.compact import compact_rows
    rng = np.random.default_rng(9)
    g, r, k_out = 2, 8, 16
    words = np.full((4, g, r, 128), 0xFFFFFFFF, dtype=np.uint32)
    for gi in range(g):
        for ri in range(r):
            nvalid = rng.integers(0, 24)           # some rows overflow 16
            lanes = np.sort(rng.choice(128, nvalid, replace=False))
            for q in range(4):
                words[q, gi, ri, lanes] = rng.integers(0, 1 << 31, nvalid)
    outs = compact_rows([jnp.asarray(w) for w in words], k_out,
                        interpret=True)
    for gi in range(g):
        for ri in range(r):
            valid = ~np.all([words[q, gi, ri] == 0xFFFFFFFF
                             for q in range(4)], axis=0)
            lanes = np.nonzero(valid)[0][:k_out]
            for q in range(4):
                got = np.asarray(outs[q][gi, ri])
                np.testing.assert_array_equal(got[:len(lanes)],
                                              words[q, gi, ri, lanes])
                assert (got[len(lanes):] == 0xFFFFFFFF).all()


def test_sketch_batch_pallas_tree_finish_interpret():
    """The tree-compaction finish (the mainline TPU path at realistic
    scale/capacity) bit-matches the portable path, including the padded
    sort + truncate-to-capacity tail."""
    import functools
    import jax
    from spaced_kmer_sketching_tpu.ops.sketch import (_sketch_batch_pallas,
                                                      _tree_chain,
                                                      sketch_core,
                                                      slots_for_scale)
    window, k, scale, cap = 20, 16, 200, 1024
    mask = spaced_seed_mask(window, k, 0)
    salt = boosthash.fmh_salt(mask.lo, mask.hi, window, 1, "modern")
    rng = np.random.default_rng(5)
    G, n = 2, 70000
    # confirm this config takes the tree path
    rows = ((n - window + 1 + 32767) // 32768 * 32768) // 128
    assert _tree_chain(rows * 16, 8.0, scale, cap, G) is not None
    codes = rng.integers(0, 4, (G, n)).astype(np.uint32)
    rid = np.stack([run_ids_from_lens([n // 2, n - n // 2], n)] * G)
    mw = jnp.asarray(mask.words_u32)

    got = _sketch_batch_pallas(jnp.asarray(codes), jnp.asarray(rid), mw,
                               salt, window=window, scale=scale,
                               variant="modern", capacity=cap,
                               interpret=True)
    fn = functools.partial(sketch_core, window=window, salt=salt,
                           scale=scale, variant="modern", capacity=cap)
    want = jax.vmap(fn, in_axes=(0, 0, None))(
        jnp.asarray(codes), jnp.asarray(rid), mw)
    assert int(np.asarray(want.raw_kept).max()) <= cap
    np.testing.assert_array_equal(np.asarray(got.count),
                                  np.asarray(want.count))
    np.testing.assert_array_equal(np.asarray(got.keys),
                                  np.asarray(want.keys))
    np.testing.assert_array_equal(np.asarray(got.raw_kept),
                                  np.asarray(want.raw_kept))


def test_compact_global_interpret():
    """compact_global closes holes across the whole flat array, preserving
    order (sorted in, sorted out)."""
    from spaced_kmer_sketching_tpu.ops.pallas.compact import compact_global
    rng = np.random.default_rng(13)
    g, n = 3, 2048
    words = np.full((4, g, n), 0xFFFFFFFF, dtype=np.uint32)
    for gi in range(g):
        nval = int(rng.integers(0, n))
        pos = np.sort(rng.choice(n, nval, replace=False))
        vals = np.sort(rng.integers(0, 1 << 62, nval).astype(np.uint64))
        words[0, gi, pos] = (vals & 0xFFFFFFFF).astype(np.uint32)
        words[1, gi, pos] = (vals >> 32).astype(np.uint32)
        words[2, gi, pos] = 7
        words[3, gi, pos] = 9
    outs = compact_global([jnp.asarray(w) for w in words], interpret=True)
    # the XLA fallback (capacities whose block exceeds scoped VMEM) must
    # agree element-for-element with the Pallas butterfly
    from spaced_kmer_sketching_tpu.ops.pallas.compact import (
        _compact_global_xla)
    outs_xla = _compact_global_xla([jnp.asarray(w) for w in words])
    for gi in range(g):
        valid = ~np.all([words[q, gi] == 0xFFFFFFFF for q in range(4)],
                        axis=0)
        pos = np.nonzero(valid)[0]
        for q in range(4):
            got = np.asarray(outs[q][gi])
            np.testing.assert_array_equal(got[:pos.size], words[q, gi, pos])
            assert (got[pos.size:] == 0xFFFFFFFF).all()
            np.testing.assert_array_equal(np.asarray(outs_xla[q][gi]), got)


@pytest.mark.parametrize("window,k", [(2, 2), (15, 9), (16, 16), (17, 10),
                                      (32, 20), (33, 21), (48, 30),
                                      (64, 40), (64, 64)])
def test_packed_kernel_window_sweep(window, k):
    """The packed-slide window construction across word-boundary edge
    cases: window multiples of 16 (negative-offset path disabled), odd
    widths, 3- and 4-word keys, and the 64-nt maximum."""
    mask, salt, codes, rid = setup(window, k, 3, 4096,
                                   runs=[1000, 96, 3000])
    canon_r, keep_r = ref_keep(codes, rid, mask, window, salt, 3)
    words, rowcnt, nw = extract_compact_windows_batched(
        jnp.asarray(codes)[None], jnp.asarray(rid)[None],
        jnp.asarray(mask.words_u32), window=window, salt=salt, scale=3,
        variant="modern", k_slots=128, interpret=True)
    want = sorted((int(canon_r[0][i]) | int(canon_r[1][i]) << 32
                   | int(canon_r[2][i]) << 64 | int(canon_r[3][i]) << 96)
                  for i in np.flatnonzero(keep_r))
    w = [np.asarray(x[0], dtype=np.uint64) for x in words]
    rc = np.asarray(rowcnt[0])
    got = []
    for r in range(rc.size):
        for s in range(rc[r]):
            i = r * 128 + s
            got.append(int(w[0][i]) | int(w[1][i]) << 32
                       | int(w[2][i]) << 64 | int(w[3][i]) << 96)
    assert sorted(got) == want
    assert rc.sum() == keep_r.sum()


def test_sketch_batch_packed_interpret():
    """Host-prepacked planes (pack_genomes_np) through the prepacked kernel
    bit-match the portable path — the ingest-pipeline hot entry."""
    import functools
    import jax
    from spaced_kmer_sketching_tpu.ops.pallas.extract import pack_genomes_np
    from spaced_kmer_sketching_tpu.ops.sketch import (sketch_batch_packed,
                                                      sketch_core)
    window, k, scale, cap = 20, 16, 200, 1024
    mask = spaced_seed_mask(window, k, 0)
    salt = boosthash.fmh_salt(mask.lo, mask.hi, window, 1, "modern")
    rng = np.random.default_rng(8)
    G, n = 2, 70000
    codes = rng.integers(0, 4, (G, n)).astype(np.uint8)
    rid = np.stack([run_ids_from_lens([n // 2, n - n // 2], n)] * G)
    mw = jnp.asarray(mask.words_u32)
    qc, qr, rid2 = pack_genomes_np(codes, rid)
    got = sketch_batch_packed(jnp.asarray(qc), jnp.asarray(qr),
                              jnp.asarray(rid2), mw, n=n, window=window,
                              salt=salt, scale=scale, variant="modern",
                              capacity=cap, interpret=True)
    fn = functools.partial(sketch_core, window=window, salt=salt,
                           scale=scale, variant="modern", capacity=cap)
    want = jax.vmap(fn, in_axes=(0, 0, None))(
        jnp.asarray(codes.astype(np.uint32)), jnp.asarray(rid), mw)
    np.testing.assert_array_equal(np.asarray(got.count),
                                  np.asarray(want.count))
    np.testing.assert_array_equal(np.asarray(got.keys),
                                  np.asarray(want.keys))


@pytest.mark.parametrize("window,k", [(10, 10), (17, 10), (32, 20),
                                      (33, 21), (48, 30), (64, 40)])
def test_sketch_batch_compact_window_sweep(window, k):
    """Compact-upload expansion across word-boundary windows (the packed
    slide math depends on window mod 16 and the word count)."""
    from spaced_kmer_sketching_tpu.ops.pallas.extract import (pack_genomes_np,
                                                              packed_body)
    from spaced_kmer_sketching_tpu.ops.sketch import (sketch_batch_compact,
                                                      sketch_batch_packed)

    mask = spaced_seed_mask(window, k, 0)
    salt = boosthash.fmh_salt(mask.lo, mask.hi, window, 1, "modern")
    rng = np.random.default_rng(window * 101 + k)
    n, scale, cap = 30000, 20, 4096
    codes = rng.integers(0, 4, (1, n)).astype(np.uint8)
    rid = np.zeros((1, n), np.int32)
    rid[0, n // 3:] = 1
    mw = jnp.asarray(mask.words_u32)
    qc, qr, rid2 = pack_genomes_np(codes, rid)
    want = sketch_batch_packed(jnp.asarray(qc), jnp.asarray(qr),
                               jnp.asarray(rid2), mw, n=n, window=window,
                               salt=salt, scale=scale, variant="modern",
                               capacity=cap, interpret=True)
    body = packed_body(n)
    c = np.zeros((body,), np.uint8)
    c[:n] = codes[0]
    w = np.uint32(1) << (2 * np.arange(16, dtype=np.uint32))
    p = (c.reshape(-1, 16).astype(np.uint32) * w).sum(-1,
                                                      dtype=np.uint32)[None]
    b = np.full((1, 64), body, np.int32)
    b[0, 0] = n // 3
    got = sketch_batch_compact(
        jnp.asarray(p), jnp.asarray(b),
        jnp.asarray(np.array([0], np.int32)),
        jnp.asarray(np.array([n], np.int32)), mw, n=n, window=window,
        salt=salt, scale=scale, variant="modern", capacity=cap,
        interpret=True)
    np.testing.assert_array_equal(np.asarray(got.count),
                                  np.asarray(want.count))
    np.testing.assert_array_equal(np.asarray(got.keys),
                                  np.asarray(want.keys))


def test_sketch_batch_compact_interpret():
    """Compact uploads (raw 2-bit pack + run bounds, expansion on device)
    bit-match the host-prepacked path — the streaming-segment hot entry."""
    from spaced_kmer_sketching_tpu.ops.pallas.extract import (pack_genomes_np,
                                                              packed_body)
    from spaced_kmer_sketching_tpu.ops.sketch import (sketch_batch_compact,
                                                      sketch_batch_packed)
    from spaced_kmer_sketching_tpu.utils import native

    window, k, scale, cap = 20, 16, 200, 1024
    mask = spaced_seed_mask(window, k, 0)
    salt = boosthash.fmh_salt(mask.lo, mask.hi, window, 1, "modern")
    rng = np.random.default_rng(9)
    n = 70000
    codes = rng.integers(0, 4, (1, n)).astype(np.uint8)
    # three runs with non-zero first id (streaming segments carry cur_run)
    rid0, starts = 5, np.array([2000, 39999], np.int64)
    rid = np.full((1, n), rid0, np.int32)
    for s in starts:
        rid[0, s:] += 1
    mw = jnp.asarray(mask.words_u32)
    qc, qr, rid2 = pack_genomes_np(codes, rid)
    want = sketch_batch_packed(jnp.asarray(qc), jnp.asarray(qr),
                               jnp.asarray(rid2), mw, n=n, window=window,
                               salt=salt, scale=scale, variant="modern",
                               capacity=cap, interpret=True)

    body = packed_body(n)
    if native.available():
        p = native.pack2bit(codes[0], body // 16)[None]
    else:
        c = np.zeros((body,), np.uint8)
        c[:n] = codes[0]
        w = np.uint32(1) << (2 * np.arange(16, dtype=np.uint32))
        p = (c.reshape(-1, 16).astype(np.uint32) * w).sum(
            -1, dtype=np.uint32)[None]
    b = np.full((1, 64), body, np.int32)
    b[0, :starts.size] = starts
    got = sketch_batch_compact(
        jnp.asarray(p), jnp.asarray(b),
        jnp.asarray(np.array([rid0], np.int32)),
        jnp.asarray(np.array([n], np.int32)), mw, n=n, window=window,
        salt=salt, scale=scale, variant="modern", capacity=cap,
        interpret=True)
    np.testing.assert_array_equal(np.asarray(got.count),
                                  np.asarray(want.count))
    np.testing.assert_array_equal(np.asarray(got.keys),
                                  np.asarray(want.keys))
    np.testing.assert_array_equal(np.asarray(got.raw_kept),
                                  np.asarray(want.raw_kept))


def test_multiseed_shared_planes_interpret():
    """Shared-plane multi-seed (single-genome planes + per-row mask/salt,
    batch=S) bit-matches replicated per-seed planes — the config-3 hot
    entry (ops/sketch.sketch_batch_packed batch=S)."""
    from spaced_kmer_sketching_tpu.ops import u64ops
    from spaced_kmer_sketching_tpu.ops.pallas.extract import (
        extract_compact_windows_prepacked, pack_genomes_np)

    window, k, scale, s = 20, 16, 20, 3
    masks = [spaced_seed_mask(window, k, seed) for seed in range(s)]
    salts = [boosthash.fmh_salt(m.lo, m.hi, window, 1, "modern")
             for m in masks]
    mw = jnp.asarray(np.stack([m.words_u32 for m in masks]))
    sp = jnp.asarray(np.stack([u64ops.salt_pair(x) for x in salts]))
    rng = np.random.default_rng(11)
    n = 70000
    codes = rng.integers(0, 4, (1, n)).astype(np.uint8)
    rid = run_ids_from_lens([n // 2, n - n // 2], n)[None]
    qc, qr, rid2 = pack_genomes_np(codes, rid)

    got = extract_compact_windows_prepacked(
        jnp.asarray(qc), jnp.asarray(qr), jnp.asarray(rid2), mw,
        nw=n - window + 1, window=window, salt=sp, scale=scale,
        variant="modern", k_slots=64, batch=s, interpret=True)
    qc_b = jnp.asarray(np.repeat(qc, s, axis=0))
    qr_b = jnp.asarray(np.repeat(qr, s, axis=0))
    rid_b = jnp.asarray(np.repeat(rid2, s, axis=0))
    want = extract_compact_windows_prepacked(
        qc_b, qr_b, rid_b, mw, nw=n - window + 1, window=window, salt=sp,
        scale=scale, variant="modern", k_slots=64, interpret=True)
    np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(want[1]))
    for a, b in zip(got[0], want[0]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sketch_batch_compact_expand_ab(monkeypatch):
    """The raw-plane kernel (default) and the XLA expansion fallback
    (SKS_COMPACT_EXPAND=xla) are bit-identical."""
    from spaced_kmer_sketching_tpu.ops.pallas.extract import packed_body
    from spaced_kmer_sketching_tpu.ops.sketch import sketch_batch_compact

    window, k, scale, cap = 18, 12, 10, 1024
    mask = spaced_seed_mask(window, k, 0)
    salt = boosthash.fmh_salt(mask.lo, mask.hi, window, 1, "modern")
    rng = np.random.default_rng(3)
    n = 40000
    codes = rng.integers(0, 4, n).astype(np.uint8)
    body = packed_body(n)
    c = np.zeros((body,), np.uint8)
    c[:n] = codes
    w = np.uint32(1) << (2 * np.arange(16, dtype=np.uint32))
    p = (c.reshape(-1, 16).astype(np.uint32) * w).sum(-1,
                                                      dtype=np.uint32)[None]
    b = np.full((1, 8), body, np.int32)
    b[0, 0] = 11111
    args = (jnp.asarray(p), jnp.asarray(b),
            jnp.asarray(np.array([3], np.int32)),
            jnp.asarray(np.array([n], np.int32)), jnp.asarray(mask.words_u32))
    kw = dict(n=n, window=window, salt=salt, scale=scale, variant="modern",
              capacity=cap, interpret=True)
    monkeypatch.delenv("SKS_COMPACT_EXPAND", raising=False)
    raw = sketch_batch_compact(*args, **kw)
    monkeypatch.setenv("SKS_COMPACT_EXPAND", "xla")
    xla = sketch_batch_compact(*args, **kw)
    np.testing.assert_array_equal(np.asarray(raw.count), np.asarray(xla.count))
    np.testing.assert_array_equal(np.asarray(raw.keys), np.asarray(xla.keys))
    np.testing.assert_array_equal(np.asarray(raw.raw_kept),
                                  np.asarray(xla.raw_kept))
