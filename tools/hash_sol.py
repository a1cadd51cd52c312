"""Micro-kernel: the boost-parity FracMinHash chain alone over N windows.

Establishes the parity-constrained speed-of-light of the fused extract
kernel (the chain is bit-fixed by src/kmer.hpp:135-149): everything else in
the kernel (packed slides, canonical select, compaction) is additive on top
of this floor.  Prints ms per 16.8M windows.
"""
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from spaced_kmer_sketching_tpu.utils.jaxcache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from spaced_kmer_sketching_tpu.ops import u64ops

    ROWS, BLK = 131072, 1024          # 16.8M windows
    salt = 0x123456789ABCDEF0

    def kern(w0_ref, w1_ref, o_ref):
        w0, w1 = w0_ref[:], w1_ref[:]
        z = jnp.zeros_like(w0)
        keep = u64ops.fmh_keep(w0, w1, z, z, salt=salt, scale=200)
        o_ref[:] = keep.astype(jnp.uint32)

    rng = np.random.default_rng(0)
    w0 = jnp.asarray(rng.integers(0, 1 << 32, (ROWS, 128), np.uint64)
                     .astype(np.uint32))
    w1 = jnp.asarray(rng.integers(0, 1 << 8, (ROWS, 128), np.uint64)
                     .astype(np.uint32))

    call = functools.partial(
        pl.pallas_call,
        grid=(ROWS // BLK,),
        in_specs=[pl.BlockSpec((BLK, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec((BLK, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ROWS, 128), jnp.uint32),
    )(kern)

    # reduce ON DEVICE: only a scalar crosses the tunnel, so the timing
    # loop measures compute, not the 64 MB device->host transfer
    fn = jax.jit(lambda a, b: call(a, b).sum())

    n_keep = int(np.asarray(fn(w0, w1)))
    iters = 16
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(w0, w1)
    chk = int(np.asarray(out))
    assert chk == n_keep
    dt = (time.perf_counter() - t0) / iters
    print(f"hash-only: {dt*1e3:.3f} ms / {ROWS*128/1e6:.1f}M windows "
          f"({ROWS*128/dt/1e9:.2f}e9 windows/s), kept {n_keep}")


if __name__ == "__main__":
    main()
