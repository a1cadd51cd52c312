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


def test_hybrid_merge_round(monkeypatch):
    """Rounds with 2*lr > MERGE_PALLAS_MAX_ROWS split into XLA cross-block
    passes + one VMEM finish kernel; shrink the threshold so the hybrid
    path runs at test size, with a ride-along tag plane."""
    from spaced_kmer_sketching_tpu.ops.pallas import sort as sort_mod

    monkeypatch.setattr(sort_mod, "MERGE_PALLAS_MAX_ROWS", 16)
    rng = np.random.default_rng(77)
    run_rows, nruns = 16, 8
    r = run_rows * nruns                      # 128 rows, every round hybrid
    n = r * 128
    vals = rng.integers(0, 1 << 30, size=(nruns, run_rows * 128),
                        dtype=np.uint32)
    vals.sort(axis=1)
    tag = np.broadcast_to(np.arange(nruns, dtype=np.uint32)[:, None],
                          (nruns, run_rows * 128)).copy()
    planes = [jnp.asarray(x.reshape(r, 128))
              for x in (vals.reshape(n), np.zeros(n, np.uint32),
                        np.zeros(n, np.uint32), np.zeros(n, np.uint32),
                        tag.reshape(n))]
    out = sort_mod.merge_sorted_runs(planes, run_rows, interpret=True)
    got_v = np.asarray(out[0]).reshape(n)
    got_t = np.asarray(out[4]).reshape(n)
    order = np.argsort(vals.reshape(n), kind="stable")
    np.testing.assert_array_equal(got_v, vals.reshape(n)[order])
    assert (sorted(zip(vals.reshape(n).tolist(), tag.reshape(n).tolist()))
            == sorted(zip(got_v.tolist(), got_t.tolist())))


def test_tiny_merge_rounds_xla():
    """Rounds with 2*lr < 8 rows violate the Pallas sublane minimum and
    must take the XLA pass path (hit by deep finish-run trees at 64M-nt
    streaming segments)."""
    from spaced_kmer_sketching_tpu.ops.pallas.sort import merge_sorted_runs

    rng = np.random.default_rng(79)
    run_rows, nruns = 1, 8                    # rounds at lr = 1, 2, 4
    r = run_rows * nruns
    n = r * 128
    vals = rng.integers(0, 1 << 32, size=(nruns, run_rows * 128),
                        dtype=np.uint64).astype(np.uint32)
    vals.sort(axis=1)
    planes = [jnp.asarray(vals.reshape(r, 128))] + [
        jnp.zeros((r, 128), jnp.uint32)] * 3
    out = merge_sorted_runs(planes, run_rows, interpret=True)
    np.testing.assert_array_equal(np.asarray(out[0]).reshape(n),
                                  np.sort(vals.reshape(n)))


def test_hybrid_merge_round_real_threshold():
    """One real-size hybrid round: merge two sorted 1024-row runs (the
    smallest size that crosses MERGE_PALLAS_MAX_ROWS) and check the result
    against numpy."""
    from spaced_kmer_sketching_tpu.ops.pallas.sort import merge_sorted_runs

    rng = np.random.default_rng(78)
    run_rows, nruns = 1024, 2
    r = run_rows * nruns
    n = r * 128
    vals = rng.integers(0, 1 << 32, size=(nruns, run_rows * 128),
                        dtype=np.uint64).astype(np.uint32)
    vals.sort(axis=1)
    planes = [jnp.asarray(vals.reshape(r, 128))] + [
        jnp.zeros((r, 128), jnp.uint32)] * 3
    out = merge_sorted_runs(planes, run_rows, interpret=True)
    got = np.asarray(out[0]).reshape(n)
    np.testing.assert_array_equal(got, np.sort(vals.reshape(n)))


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


def test_merge_pair_streams_matches_sort():
    """merge_pair_streams (reversal-free bitonic pair merge) == global
    sort of the concatenation, including duplicate keys, ride-along tag
    planes and sentinel tails."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from spaced_kmer_sketching_tpu.ops.pallas.sort import (
        LANES, merge_pair_streams)

    rng = np.random.default_rng(23)
    rows = 4                                   # 512 entries per stream
    n = rows * LANES
    for trial in range(3):
        sides = []
        for _ in range(2):
            cnt = int(rng.integers(1, n))
            v = rng.integers(0, 500, size=cnt, dtype=np.uint32)
            t = rng.integers(0, 1 << 31, size=cnt, dtype=np.uint32)
            # inputs must be sorted in the comparator's TOTAL order
            # (key, then tag) — the packed (key, gid) planes always are
            o = np.lexsort((t, v))
            key = np.full(n, 0xFFFFFFFF, np.uint32)
            tag = np.full(n, 0xFFFFFFFF, np.uint32)
            key[:cnt] = v[o]
            tag[:cnt] = t[o]
            sides.append([jnp.asarray(key.reshape(rows, LANES)),
                          jnp.asarray(tag.reshape(rows, LANES))])
        merged = merge_pair_streams(sides[0], sides[1], nkeys=1)
        got = [np.asarray(p).reshape(n * 2) for p in merged]
        allk = np.concatenate([np.asarray(p[0]).reshape(n) for p in sides])
        allt = np.concatenate([np.asarray(p[1]).reshape(n) for p in sides])
        order = np.lexsort((allt, allk))       # tag is the tiebreaker
        assert np.array_equal(got[0], allk[order])
        assert np.array_equal(got[1], allt[order])
