"""Time individual pieces of the sketch step on the real TPU."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def scalarize(fn):
    """Wrap fn to reduce all outputs to ONE scalar on device, so forcing
    completion costs a 4-byte transfer (block_until_ready can return early
    on the axon tunnel; a full-array np.asarray pollutes the timing)."""
    import jax
    import jax.numpy as jnp

    def wrapped(*a):
        out = fn(*a)
        leaves = [x for x in jax.tree_util.tree_leaves(out)
                  if hasattr(x, "ravel")]
        return sum(x.ravel()[-1].astype(jnp.int32) for x in leaves)
    return jax.jit(wrapped)


def timeit(name, fn, iters=8):
    out = fn()
    np.asarray(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    np.asarray(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:40s} {dt*1e3:8.3f} ms")
    return out, dt


def main():
    from spaced_kmer_sketching_tpu.utils.jaxcache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from spaced_kmer_sketching_tpu.ops.extract import run_ids_from_lens
    from spaced_kmer_sketching_tpu.ops import sketch as sk
    from spaced_kmer_sketching_tpu.ops.pallas.extract import (
        extract_compact_windows_batched, extract_filter_windows_batched)
    from spaced_kmer_sketching_tpu.utils import boosthash
    from spaced_kmer_sketching_tpu.utils.masks import spaced_seed_mask

    window, k, scale, n, g = 20, 16, 200, 1 << 21, 8
    mask = spaced_seed_mask(window, k, 0)
    salt = boosthash.fmh_salt(mask.lo, mask.hi, window, 1, "modern")
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, (g, n)).astype(np.uint32)
    run_id = np.stack([run_ids_from_lens([n], n)] * g)
    capacity = 1 << max(10, (max(1, 2 * n // scale)).bit_length())
    dev_codes, dev_rid = jnp.asarray(codes), jnp.asarray(run_id)
    dev_mask = jnp.asarray(mask.words_u32)

    which = sys.argv[1] if len(sys.argv) > 1 else "all"

    if which in ("all", "full"):
        fn = scalarize(lambda c, r, m: sk.sketch_batch(
            c, r, m, window=window, salt=salt, scale=scale,
            variant="modern", capacity=capacity))
        timeit("full step (capacity=%d)" % capacity,
               lambda: fn(dev_codes, dev_rid, dev_mask))

    for ks in (8, 16):
        if which in ("all", f"compact{ks}"):
            f = scalarize(lambda c, r, m, ks=ks: extract_compact_windows_batched(
                c, r, m, window=window, salt=salt, scale=scale,
                variant="modern", k_slots=ks))
            timeit(f"extract+compact k_slots={ks}",
                   lambda: f(dev_codes, dev_rid, dev_mask))

    if which in ("all", "nocompact"):
        f = scalarize(lambda c, r, m: extract_filter_windows_batched(
            c, r, m, window=window, salt=salt, scale=scale,
            variant="modern"))
        timeit("extract only (full canon out)",
               lambda: f(dev_codes, dev_rid, dev_mask))


if __name__ == "__main__":
    sys.exit(main())


def hash_only(args_ns=None):
    """Time fmh_keep alone on precomputed keys: the parity-fixed floor."""
    from spaced_kmer_sketching_tpu.utils.jaxcache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from spaced_kmer_sketching_tpu.ops import u64ops
    from spaced_kmer_sketching_tpu.utils import boosthash
    from spaced_kmer_sketching_tpu.utils.masks import spaced_seed_mask

    mask = spaced_seed_mask(20, 16, 0)
    salt = boosthash.fmh_salt(mask.lo, mask.hi, 20, 1, "modern")
    rng = np.random.default_rng(0)
    g, n = 8, 1 << 21
    ws = [np.ascontiguousarray(rng.integers(0, 1 << 32, (g, n), dtype=np.uint64)
                               .astype(np.uint32)) for _ in range(4)]
    dws = [jnp.asarray(w) for w in ws]

    f = scalarize(lambda a, b, c, d: u64ops.fmh_keep(
        a, b, c, d, salt=salt, scale=200, variant="modern"))
    timeit("fmh_keep only (8x2M keys)", lambda: f(*dws))
