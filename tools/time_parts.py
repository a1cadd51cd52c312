"""Time individual pieces of the sketch step on the real TPU."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _force(out):
    """Force true completion: device->host copy of one element (the axon
    tunnel's block_until_ready can return before execution finishes)."""
    leaves = [x for x in (out if isinstance(out, (tuple, list)) else [out])]
    flat = []
    for x in leaves:
        flat.extend(x if isinstance(x, (tuple, list)) else [x])
    np.asarray(flat[0]).ravel()[0]


def timeit(name, fn, iters=8):
    out = fn()
    _force(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    _force(out)
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
        fn = sk.jitted_sketch_batch(window, salt, scale, "modern", capacity)
        timeit("full step (capacity=%d)" % capacity,
               lambda: fn(dev_codes, dev_rid, dev_mask))

    if which in ("all", "compact16"):
        f = jax.jit(lambda c, r, m: extract_compact_windows_batched(
            c, r, m, window=window, salt=salt, scale=scale,
            variant="modern", k_slots=16))
        timeit("extract+compact k_slots=16",
               lambda: f(dev_codes, dev_rid, dev_mask))

    if which in ("all", "compact8"):
        f = jax.jit(lambda c, r, m: extract_compact_windows_batched(
            c, r, m, window=window, salt=salt, scale=scale,
            variant="modern", k_slots=8))
        timeit("extract+compact k_slots=8",
               lambda: f(dev_codes, dev_rid, dev_mask))

    if which in ("all", "nocompact"):
        f = jax.jit(lambda c, r, m: extract_filter_windows_batched(
            c, r, m, window=window, salt=salt, scale=scale,
            variant="modern"))
        timeit("extract only (full canon out)",
               lambda: f(dev_codes, dev_rid, dev_mask))


if __name__ == "__main__":
    sys.exit(main())
