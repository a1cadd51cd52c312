"""Time the on-device Gram engine's phases on the real TPU.

Phases: (a) the (key, gid) merge sort, (b) the chunked S^T E S scan,
(c) the whole engine — for G in {128, 256} at cap 8192, key_words=2.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(name, fn, iters=8):
    out = fn()
    np.asarray(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    np.asarray(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:48s} {dt*1e3:8.3f} ms")
    return out, dt


def synth(g, cap, kbits=40, seed=0):
    rng = np.random.default_rng(seed)
    pool = np.unique(rng.integers(0, 1 << kbits, size=2 * cap).astype(np.uint64))
    keys = np.full((g, cap, 4), 0xFFFFFFFF, dtype=np.uint32)
    counts = np.zeros((g,), np.int32)
    for i in range(g):
        shared = rng.choice(pool, size=int(cap * 0.6), replace=False)
        priv = rng.integers(0, 1 << kbits, size=cap - shared.size).astype(np.uint64)
        u = np.unique(np.concatenate([shared, priv]))
        counts[i] = u.size
        keys[i, :u.size, 0] = (u & 0xFFFFFFFF).astype(np.uint32)
        keys[i, :u.size, 1] = (u >> 32).astype(np.uint32)
        keys[i, :u.size, 2] = 0
        keys[i, :u.size, 3] = 0
    return keys, counts


def main():
    from spaced_kmer_sketching_tpu.utils.jaxcache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from jax import lax
    from spaced_kmer_sketching_tpu.ops.gram import (
        _gram_chunks_packed, _pack_gid_planes, _sort_packed,
        gram_all_pairs_ondevice, pack_plan)
    from spaced_kmer_sketching_tpu.ops.pallas.sort import LANES

    kw, key_bits = 2, 40
    for g in (128, 256):
        cap = 8192
        keys_np, counts_np = synth(g, cap)
        keys = jnp.asarray(keys_np[:, :, :kw])
        counts = jnp.asarray(counts_np)

        timeit(f"full ondevice G={g}",
               lambda: gram_all_pairs_ondevice(keys, counts, key_words=kw,
                                               key_bits=key_bits))

        g2 = 1 << max(0, (g - 1).bit_length())
        n = g2 * cap
        gidbits = max(1, (g2 - 1).bit_length())
        pw = pack_plan(key_bits, gidbits)
        gid = jnp.broadcast_to(jnp.arange(g2, dtype=jnp.uint32)[:, None],
                               (g2, cap))

        @jax.jit
        def sort_only(keys):
            planes = _pack_gid_planes(keys, gid, key_bits, gidbits, pw)
            planes = [p.reshape(n // LANES, LANES) for p in planes]
            merged = _sort_packed(planes, cap // LANES, False)
            return [p.ravel()[-1] for p in merged]

        timeit(f"packed merge sort only G={g} (pw={pw})",
               lambda: sort_only(keys))

        gp = max(LANES, -(-g // LANES) * LANES)

        @jax.jit
        def scan_only(keys):
            planes = _pack_gid_planes(keys, gid, key_bits, gidbits, pw)
            planes = [p.reshape(n // LANES, LANES) for p in planes]
            merged = _sort_packed(planes, cap // LANES, False)
            sw = [p.reshape(n) for p in merged]
            acc = _gram_chunks_packed(sw, gidbits, gp, LANES)
            return acc[0, 0]

        timeit(f"sort+scan (no slice) G={g}", lambda: scan_only(keys))


if __name__ == "__main__":
    sys.exit(main())
