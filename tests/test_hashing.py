"""Cross-check the three FracMinHash implementations key-by-key:
numpy (host oracle) vs C++ (native ext) vs JAX uint32-lane (device path)."""
import numpy as np
import pytest

from spaced_kmer_sketching_tpu.utils import boosthash, native


@pytest.fixture(scope="module")
def keys():
    rng = np.random.default_rng(42)
    lo = rng.integers(0, 2**64, 4096, dtype=np.uint64)
    hi = rng.integers(0, 2**64, 4096, dtype=np.uint64)
    # include edge values
    lo[:4] = [0, 1, 2**64 - 1, 0x9E3779B9]
    hi[:4] = [0, 0, 2**64 - 1, 0]
    return lo, hi


@pytest.mark.parametrize("variant", ["modern", "legacy"])
def test_numpy_vs_native(keys, variant):
    if not native.available():
        pytest.skip("native lib unavailable")
    lo, hi = keys
    got = boosthash.hash_bitset128(lo, hi, variant)
    want = native.hash_bitset128_batch(lo, hi, variant == "legacy")
    assert (got == want).all()


@pytest.mark.parametrize("variant", ["modern", "legacy"])
def test_jax_vs_numpy(keys, variant):
    import jax.numpy as jnp
    from spaced_kmer_sketching_tpu.ops import u64ops

    lo, hi = keys
    w0 = jnp.asarray((lo & 0xFFFFFFFF).astype(np.uint32))
    w1 = jnp.asarray((lo >> np.uint64(32)).astype(np.uint32))
    w2 = jnp.asarray((hi & 0xFFFFFFFF).astype(np.uint32))
    w3 = jnp.asarray((hi >> np.uint64(32)).astype(np.uint32))
    hh, hl = u64ops.hash_bitset128(w0, w1, w2, w3, variant)
    got = (np.asarray(hh).astype(np.uint64) << np.uint64(32)) | np.asarray(hl)
    want = boosthash.hash_bitset128(lo, hi, variant)
    assert (got == want).all()


@pytest.mark.parametrize("scale", [200, 7, 1000])
@pytest.mark.parametrize("variant", ["modern", "legacy"])
def test_fmh_keep_matches_host(keys, variant, scale):
    import jax.numpy as jnp
    from spaced_kmer_sketching_tpu.ops import u64ops

    lo, hi = keys
    salt = boosthash.fmh_salt(0x3FF, 0, 20, 1, variant)
    want = boosthash.sketch_keep(lo, hi, salt, scale, variant)
    w0 = jnp.asarray((lo & 0xFFFFFFFF).astype(np.uint32))
    w1 = jnp.asarray((lo >> np.uint64(32)).astype(np.uint32))
    w2 = jnp.asarray((hi & 0xFFFFFFFF).astype(np.uint32))
    w3 = jnp.asarray((hi >> np.uint64(32)).astype(np.uint32))
    got = np.asarray(u64ops.fmh_keep(w0, w1, w2, w3, salt=salt, scale=scale,
                                     variant=variant))
    assert (got == want).all()


def test_salt_structure():
    # fmh = H(masked) ^ H(mask) ^ window ^ nonce (src/kmer.hpp:144-148);
    # nonce = boost::hash<int>(1) = 1 (identity for small ints).
    salt = boosthash.fmh_salt(mask_lo=0xFF, mask_hi=0, window=4, nonce=1)
    h_mask = int(boosthash.hash_bitset128(np.uint64(0xFF), np.uint64(0)))
    assert salt == h_mask ^ 4 ^ 1
