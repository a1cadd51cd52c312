"""Micro-benchmark the bitonic merge-sort components on the real TPU.

The on-device Gram engine spends ~90% of its time in merge_sorted_runs
(tools/time_gram.py); this isolates rounds/passes to find the overhead.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(name, fn, iters=16):
    out = fn()
    np.asarray(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    np.asarray(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:52s} {dt*1e3:8.3f} ms")
    return out, dt


def main():
    from spaced_kmer_sketching_tpu.utils.jaxcache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from spaced_kmer_sketching_tpu.ops.pallas import sort as ps

    rng = np.random.default_rng(0)
    n = 1 << 20                       # 1M entries, the G=128 x 8192 case
    r = n // ps.LANES                 # 8192 rows
    nplanes = 3                       # kw=2 + gid
    planes_np = [rng.integers(0, 1 << 32, (r, ps.LANES), dtype=np.uint64)
                 .astype(np.uint32) for _ in range(nplanes)]
    planes = [jnp.asarray(p) for p in planes_np]

    def last(ps_):
        return [p.ravel()[-1] for p in ps_]

    # full merge tree from cap-sized runs (what the gram engine does)
    run_rows = 8192 // ps.LANES       # 64

    @jax.jit
    def tree(ps_):
        return last(ps.merge_sorted_runs(list(ps_), run_rows, nkeys=2))
    timeit("merge tree 1M x3 (7 rounds)", lambda: tree(planes))

    # one XLA pass at large distance
    @jax.jit
    def xla_pass(ps_):
        return last(ps._merge_pass_xla(list(ps_), n // 2, n, nkeys=2))
    timeit("one XLA pass d=n/2", lambda: xla_pass(planes))

    # one finish kernel (17 VMEM passes, 8 blocks of 1024 rows)
    @jax.jit
    def finish(ps_):
        return last(ps._merge_finish(list(ps_), r // 2, 1024, False, nkeys=2))
    timeit("one finish kernel (17 passes, blk 1024)", lambda: finish(planes))

    # one all-VMEM merge round at lr=64 (64 blocks x 14 passes)
    @jax.jit
    def round64(ps_):
        return last(ps._merge_round(list(ps_), 64, False, nkeys=2))
    timeit("one VMEM round lr=64 (14 passes)", lambda: round64(planes))

    @jax.jit
    def round512(ps_):
        return last(ps._merge_round(list(ps_), 512, False, nkeys=2))
    timeit("one VMEM round lr=512 (17 passes)", lambda: round512(planes))

    # the odd-run reversal step
    @jax.jit
    def rev(ps_):
        nruns = r // run_rows
        out = []
        for p in ps_:
            runs = p.reshape(nruns, run_rows * ps.LANES)
            par = (jax.lax.broadcasted_iota(jnp.int32, (nruns, 1), 0) % 2) == 1
            out.append(jnp.where(par, runs[:, ::-1], runs).reshape(r, ps.LANES))
        return last(out)
    timeit("odd-run reversal", lambda: rev(planes))

    # 2 planes instead of 3 (packed key+gid)
    planes2 = planes[:2]

    @jax.jit
    def tree2(ps_):
        return last(ps.merge_sorted_runs(list(ps_), run_rows, nkeys=2))
    timeit("merge tree 1M x2 planes", lambda: tree2(planes2))


if __name__ == "__main__":
    sys.exit(main())
