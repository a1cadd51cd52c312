"""Bucketized all-pairs intersection: layout invariants + kernel parity.

Oracle: python-set intersection of the 128-bit keys — the same semantics as
the reference's hash-set probe (src/kmer_set.cpp:23-41).  Kernel runs in
interpret mode here; bench.py re-verifies key-level parity on hardware.
"""
import numpy as np
import pytest

from spaced_kmer_sketching_tpu.ops.bucketized import (
    build_bucket_layout, layout_lanes, mix64, spill_correction)
from spaced_kmer_sketching_tpu.ops.pallas.bucket_intersect import (
    bucketized_all_pairs)


def _make_sketches(g, cap, bits, seed=0, share=0.5, force_keys=()):
    """Sorted-unique synthetic sketches with a shared pool (realistic
    overlap) plus optional forced keys present in every sketch."""
    rng = np.random.default_rng(seed)
    hi_bits = max(0, bits - 64)
    pool = rng.integers(0, 1 << min(bits, 63), size=2 * cap).astype(np.uint64)
    keys = np.full((g, cap, 4), 0xFFFFFFFF, np.uint32)
    counts = np.zeros(g, np.int32)
    sets = []
    for i in range(g):
        take = rng.choice(pool, size=int(cap * share * 0.6), replace=False)
        priv = rng.integers(0, 1 << min(bits, 63),
                            size=int(cap * 0.3)).astype(np.uint64)
        lo = np.unique(np.concatenate([take, priv]))
        hi = (rng.integers(0, 1 << hi_bits, size=lo.size).astype(np.uint64)
              if hi_bits else np.zeros(lo.size, np.uint64))
        full = sorted({(int(h), int(v)) for h, v in zip(hi, lo)}
                      | set(force_keys))[: cap]
        sets.append(set(full))
        counts[i] = len(full)
        for r, (h, v) in enumerate(full):
            keys[i, r, 0] = v & 0xFFFFFFFF
            keys[i, r, 1] = (v >> 32) & 0xFFFFFFFF
            keys[i, r, 2] = h & 0xFFFFFFFF
            keys[i, r, 3] = (h >> 32) & 0xFFFFFFFF
    want = np.array([[len(a & b) for b in sets] for a in sets], np.int64)
    return keys, counts, want


def test_mix64_bijective_sample():
    x = np.random.default_rng(1).integers(0, 1 << 63, 4096).astype(np.uint64)
    assert np.unique(mix64(x)).size == x.size


def test_layout_places_every_key_once():
    keys, counts, _ = _make_sketches(4, 256, bits=40, seed=2)
    planes, spills = build_bucket_layout(keys, counts, window=20,
                                         slots=4, bucket_factor=2)
    g, p, bd, lanes = planes.shape
    assert p == 4 * layout_lanes(20) and bd * lanes == 2 * 256 and lanes == 128
    for i in range(g):
        tagged = int((planes[i, 1::2] >> 31).sum())   # lane-1 planes carry tag
        assert tagged + len(spills[i]) == counts[i]


@pytest.mark.parametrize("window,bits", [(20, 40), (50, 100)])
def test_all_pairs_matches_set_oracle(window, bits):
    keys, counts, want = _make_sketches(8, 512, bits=bits, seed=3)
    got = bucketized_all_pairs(keys, counts, window, interpret=True)
    np.testing.assert_array_equal(got, want)
    assert np.array_equal(np.diag(got), counts)       # self-pairs


def test_empty_and_edge_keys():
    # all-zero key and near-all-ones keys are REAL values (poly-A genome /
    # full-window masks); an empty sketch must intersect as zero
    zero = (0, 0)
    ones = ((1 << 64) - 1, (1 << 64) - 1)
    keys, counts, want = _make_sketches(8, 256, bits=100, seed=4,
                                        force_keys=(zero, ones))
    counts[5] = 0
    keys[5] = 0xFFFFFFFF
    want[5, :] = 0
    want[:, 5] = 0
    got = bucketized_all_pairs(keys, counts, window=50, interpret=True)
    np.testing.assert_array_equal(got, want)


def test_spill_correction_exact_under_tiny_slots():
    # slots=1 forces heavy spilling; the host correction must restore
    # exact counts
    keys, counts, want = _make_sketches(8, 256, bits=40, seed=5)
    got = bucketized_all_pairs(keys, counts, window=20, slots=1,
                               bucket_factor=1, interpret=True)
    np.testing.assert_array_equal(got, want)


def test_spill_correction_standalone():
    keys, counts, want = _make_sketches(6, 128, bits=40, seed=6)
    planes, spills = build_bucket_layout(keys, counts, window=20, slots=1,
                                         bucket_factor=1)
    assert any(len(s) for s in spills)
    corr = spill_correction(keys, counts, spills)
    assert corr.shape == want.shape and (corr >= 0).any()


def test_padding_to_block_multiple():
    keys, counts, want = _make_sketches(5, 256, bits=40, seed=7)  # 5 % 8 != 0
    got = bucketized_all_pairs(keys, counts, window=20, interpret=True)
    np.testing.assert_array_equal(got, want)
