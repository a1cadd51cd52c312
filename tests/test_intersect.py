"""Batched intersection op vs Python sets and the C++ merge."""
import numpy as np
import pytest

import jax.numpy as jnp

from spaced_kmer_sketching_tpu.ops.intersect import (intersection_tile,
                                                     pair_intersection_batch)
from spaced_kmer_sketching_tpu.utils import native


def make_sketch(vals, cap):
    """vals: iterable of 128-bit ints -> (cap,4) uint32 sorted + count."""
    vals = sorted(set(vals))
    keys = np.full((cap, 4), 0xFFFFFFFF, dtype=np.uint32)
    for i, v in enumerate(vals):
        for q in range(4):
            keys[i, q] = (v >> (32 * q)) & 0xFFFFFFFF
    return keys, np.int32(len(vals))


def rand_sets(rng, n_pairs, universe, size, cap):
    ka, ca, kb, cb, want = [], [], [], [], []
    for _ in range(n_pairs):
        a = set(int(x) for x in rng.integers(0, universe, size))
        b = set(int(x) for x in rng.integers(0, universe, size))
        # lift into 128-bit space with high words sometimes set
        lift = lambda s: {v | (v % 7) << 64 | (v % 3) << 100 for v in s}
        a, b = lift(a), lift(b)
        k1, c1 = make_sketch(a, cap)
        k2, c2 = make_sketch(b, cap)
        ka.append(k1); ca.append(c1); kb.append(k2); cb.append(c2)
        want.append(len(a & b))
    return (jnp.asarray(np.stack(ka)), jnp.asarray(np.array(ca)),
            jnp.asarray(np.stack(kb)), jnp.asarray(np.array(cb)), want)


def test_pairwise_matches_sets():
    rng = np.random.default_rng(0)
    ka, ca, kb, cb, want = rand_sets(rng, 32, universe=500, size=120, cap=256)
    got = np.asarray(pair_intersection_batch(ka, ca, kb, cb))
    assert list(got) == want


def test_empty_and_identical():
    cap = 64
    k0, c0 = make_sketch([], cap)
    k1, c1 = make_sketch([5, 9, 1 << 127], cap)
    ka = jnp.asarray(np.stack([k0, k1, k1]))
    ca = jnp.asarray(np.array([c0, c1, c1]))
    kb = jnp.asarray(np.stack([k1, k1, k0]))
    cb = jnp.asarray(np.array([c1, c1, c0]))
    got = list(np.asarray(pair_intersection_batch(ka, ca, kb, cb)))
    assert got == [0, 3, 0]


def test_tile_matches_pairwise():
    rng = np.random.default_rng(1)
    cap = 128
    sketches = []
    for _ in range(6):
        vals = {int(x) * 17 for x in rng.integers(0, 300, 60)}
        sketches.append(make_sketch(vals, cap))
    keys = jnp.asarray(np.stack([k for k, _ in sketches]))
    counts = jnp.asarray(np.array([c for _, c in sketches]))
    tile = np.asarray(intersection_tile(keys, counts, keys, counts))
    # diagonal = set sizes; symmetric
    assert (np.diag(tile) == np.asarray(counts)).all()
    assert (tile == tile.T).all()


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
def test_matches_cpp_merge():
    rng = np.random.default_rng(2)
    cap = 256
    a = {int(x) | int(x % 5) << 64 for x in rng.integers(0, 10**6, 200)}
    b = set(list(a)[:50]) | {int(x) << 32 for x in rng.integers(0, 10**6, 150)}
    k1, c1 = make_sketch(a, cap)
    k2, c2 = make_sketch(b, cap)

    def to_u64(vals):
        vals = sorted(vals)
        out = np.zeros((len(vals), 2), dtype=np.uint64)
        for i, v in enumerate(vals):
            out[i, 0] = v & ((1 << 64) - 1)
            out[i, 1] = v >> 64
        return out

    want = native.intersect_sorted(to_u64(a), to_u64(b))
    got = int(np.asarray(pair_intersection_batch(
        jnp.asarray(k1[None]), jnp.asarray(np.array([c1])),
        jnp.asarray(k2[None]), jnp.asarray(np.array([c2]))))[0])
    assert got == want == len(a & b)


def test_all_pairs_matrix_matches_tile():
    from spaced_kmer_sketching_tpu.ops.intersect import (all_pairs_matrix,
                                                         intersection_tile)
    rng = np.random.default_rng(3)
    g, cap = 8, 256
    keys = np.full((g, cap, 4), 0xFFFFFFFF, np.uint32)
    counts = np.zeros(g, np.int32)
    for i in range(g):
        n = int(rng.integers(1, cap))
        vals = np.unique(rng.integers(0, 1 << 30, n).astype(np.uint32))
        keys[i, :vals.size, 0] = vals
        keys[i, :vals.size, 1:] = 0
        counts[i] = vals.size
    k, c = jnp.asarray(keys), jnp.asarray(counts)
    want = np.asarray(intersection_tile(k, c, k, c))
    got = np.asarray(all_pairs_matrix(k, c, row_tile=4))
    np.testing.assert_array_equal(got, want)
