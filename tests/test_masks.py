"""Mask generation parity: Python mt19937+libstdc++-shuffle replica vs the
real libstdc++ (native ext), plus format/semantics checks."""
import pytest

from spaced_kmer_sketching_tpu.config import MAX_KMER_LENGTH
from spaced_kmer_sketching_tpu.utils import native
from spaced_kmer_sketching_tpu.utils.masks import (contiguous_mask,
                                                   spaced_seed_mask)
from spaced_kmer_sketching_tpu.utils.mt19937 import MT19937, libstdcxx_shuffle


def test_mt19937_reference_values():
    # C++ standard mandates mt19937(5489)'s 10000th draw == 4123659995.
    g = MT19937(5489)
    for _ in range(9999):
        g()
    assert g() == 4123659995


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
@pytest.mark.parametrize("seed", [0, 1, 7, 123456789])
@pytest.mark.parametrize("window", [1, 2, 3, 10, 11, 20, 33, 50, 64])
def test_shuffle_matches_libstdcxx(window, seed):
    want = list(native.mask_indices(window, window, seed))
    got = libstdcxx_shuffle(list(range(window)), seed)
    assert got == want


def test_mask_structure():
    m = spaced_seed_mask(20, 16, 0)
    assert m.count == 32 and m.care_positions == 16
    assert len(m.bitstring()) == 128
    assert m.bitstring().count("1") == 32
    # both bits of each chosen position set: value has only paired bits
    v = m.value
    for p in range(64):
        bits = (v >> (2 * p)) & 3
        assert bits in (0, 3)


def test_mask_python_fallback_equals_native():
    if not native.available():
        pytest.skip("native lib unavailable")
    for w, k, s in [(10, 10, 0), (30, 20, 0), (50, 40, 0), (64, 64, 5)]:
        a = spaced_seed_mask(w, k, s, use_native=True)
        b = spaced_seed_mask(w, k, s, use_native=False)
        assert (a.lo, a.hi) == (b.lo, b.hi)


def test_contiguous_and_w_eq_k():
    # with w == k the random mask covers the whole window -> effectively a
    # contiguous k-mer (src/kmer-sketching.cpp:228-233)
    for k in (5, 12, 31):
        m = spaced_seed_mask(k, k, 0)
        assert m.value == contiguous_mask(k).value == (1 << (2 * k)) - 1


def test_width_check():
    with pytest.raises(ValueError):
        spaced_seed_mask(MAX_KMER_LENGTH + 1, 10, 0)
    with pytest.raises(ValueError):
        contiguous_mask(MAX_KMER_LENGTH + 1)
