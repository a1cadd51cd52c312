"""Device extraction op vs the pure-Python oracle."""
import numpy as np
import pytest

import jax.numpy as jnp

from spaced_kmer_sketching_tpu.ops.extract import extract_windows, run_ids_from_lens
from spaced_kmer_sketching_tpu.utils.masks import contiguous_mask, spaced_seed_mask

from oracle import oracle_all_windows


def keys_to_ints(words, valid):
    w = [np.asarray(x, dtype=np.uint64) for x in words]
    vals = []
    for i in np.flatnonzero(np.asarray(valid)):
        v = int(w[0][i]) | int(w[1][i]) << 32 | int(w[2][i]) << 64 | int(w[3][i]) << 96
        vals.append(v)
    return vals


def run_case(runs, window, mask, pad=7):
    total = sum(len(r) for r in runs)
    n = total + pad
    codes = np.zeros(n, dtype=np.uint32)
    flat = [c for r in runs for c in r]
    codes[:total] = flat
    run_id = run_ids_from_lens([len(r) for r in runs], n)
    got_words, valid = extract_windows(jnp.asarray(codes), jnp.asarray(run_id),
                                       window, jnp.asarray(mask.words_u32))
    got = keys_to_ints(got_words, valid)
    want = oracle_all_windows(runs, mask.value, window)
    assert got == want


@pytest.mark.parametrize("window,k", [(4, 4), (10, 10), (10, 5), (20, 16),
                                      (33, 20), (50, 40), (64, 64), (64, 30)])
def test_extract_matches_oracle(window, k):
    rng = np.random.default_rng(window * 100 + k)
    runs = [list(rng.integers(0, 4, n)) for n in (window - 1,  # too short
                                                  window,      # exactly one
                                                  137, 260)]
    mask = spaced_seed_mask(window, k, 0)
    run_case(runs, window, mask)


def test_extract_contiguous_mask():
    rng = np.random.default_rng(0)
    runs = [list(rng.integers(0, 4, 100))]
    run_case(runs, 16, contiguous_mask(16))


def test_canonical_prefers_smaller_strand():
    # 'AAAA' forward = 0; revcomp = 'TTTT' = all ones -> canonical is forward.
    # 'TTTT' forward = all ones; revcomp = 'AAAA' = 0 -> canonical is revcomp.
    mask = contiguous_mask(4)
    w = 4
    codes = np.array([0, 0, 0, 0, 3, 3, 3, 3], dtype=np.uint32)
    run_id = run_ids_from_lens([4, 4], 8)
    words, valid = extract_windows(jnp.asarray(codes), jnp.asarray(run_id), w,
                                   jnp.asarray(mask.words_u32))
    vals = keys_to_ints(words, valid)
    assert vals == [0, 0]


def test_no_window_spans_runs():
    # two runs of 3 with window 4: no valid windows even though 6 codes total
    codes = np.zeros(8, dtype=np.uint32)
    run_id = run_ids_from_lens([3, 3], 8)
    mask = contiguous_mask(4)
    _, valid = extract_windows(jnp.asarray(codes), jnp.asarray(run_id), 4,
                               jnp.asarray(mask.words_u32))
    assert not np.asarray(valid).any()
