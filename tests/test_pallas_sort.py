"""Pallas bitonic 128-bit sort vs numpy lexsort (interpret mode on CPU)."""
import numpy as np
import pytest

import jax.numpy as jnp

from spaced_kmer_sketching_tpu.ops.pallas.sort import bitonic_sort_128


def lexsorted(keys):
    order = np.lexsort((keys[:, 0], keys[:, 1], keys[:, 2], keys[:, 3]))
    return keys[order]


@pytest.mark.parametrize("n", [1024, 4096])
def test_random_keys(n):
    rng = np.random.default_rng(n)
    keys = rng.integers(0, 2 ** 32, size=(n, 4), dtype=np.uint64).astype(
        np.uint32)
    out = np.asarray(bitonic_sort_128(jnp.asarray(keys), interpret=True))
    np.testing.assert_array_equal(out, lexsorted(keys))


def test_duplicates_and_sentinels():
    rng = np.random.default_rng(7)
    keys = rng.integers(0, 2 ** 32, size=(2048, 4), dtype=np.uint64).astype(
        np.uint32)
    keys[::3] = keys[1]                      # heavy duplication
    keys[-100:] = 0xFFFFFFFF                 # sentinel padding
    keys[:50, 2:] = 0                        # low-entropy high words
    out = np.asarray(bitonic_sort_128(jnp.asarray(keys), interpret=True))
    np.testing.assert_array_equal(out, lexsorted(keys))


def test_rejects_bad_shapes():
    with pytest.raises(AssertionError):
        bitonic_sort_128(jnp.zeros((1000, 4), jnp.uint32), interpret=True)


def test_sort_truncate_sparse_candidates():
    from spaced_kmer_sketching_tpu.ops.pallas.sort import (TILE_ELEMS,
                                                           sort_truncate_128)
    rng = np.random.default_rng(42)
    m, capacity = 4 * TILE_ELEMS, 8192
    keys = np.full((m, 4), 0xFFFFFFFF, dtype=np.uint32)
    # ~1500 valid keys spread over all tiles (well under capacity/4 per tile)
    pos = rng.choice(m, size=1500, replace=False)
    keys[pos] = rng.integers(0, 2 ** 32, size=(1500, 4),
                             dtype=np.uint64).astype(np.uint32)
    out = np.asarray(sort_truncate_128(jnp.asarray(keys), capacity,
                                       interpret=True))
    want = lexsorted(keys)[:capacity]
    np.testing.assert_array_equal(out, want)


@pytest.mark.parametrize("run_rows", [4, 32])
def test_multi_run_sort_alternating_directions(run_rows):
    """Exercises the multi-run kernel specifically: runs-per-block must be
    an even power of two (the fallback path hides formula bugs otherwise)."""
    from spaced_kmer_sketching_tpu.ops.pallas.sort import sort_runs_128
    rng = np.random.default_rng(run_rows)
    R = 256
    keys = rng.integers(0, 2 ** 32, size=(R * 128, 4),
                        dtype=np.uint64).astype(np.uint32)
    planes = [jnp.asarray(keys[:, q].reshape(R, 128)) for q in range(4)]
    outs = sort_runs_128(planes, run_rows, interpret=True)
    out = np.stack([np.asarray(o).reshape(-1) for o in outs], axis=1)
    run = run_rows * 128
    for i in range(R * 128 // run):
        seg = keys[i * run:(i + 1) * run]
        want = lexsorted(seg)
        if i % 2 == 1:
            want = want[::-1]
        np.testing.assert_array_equal(out[i * run:(i + 1) * run], want,
                                      err_msg=f"run {i}")
