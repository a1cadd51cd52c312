"""Benchmark harness — prints ONE JSON line for the driver.

Headline metric: spaced k-mers/s/chip through the fused device sketch step
(extraction + FracMinHash filter + sort-unique dedup), the hot loop of the
reference (src/kmer_sliding.cpp:144-185 + kmer_set insert).  vs_baseline
compares against the native C++ scalar pipeline (native/sketchlib.cpp,
an -O3 single-thread re-statement of the reference algorithm) on this host —
the reference itself publishes no numbers (BASELINE.md).

Usage: python bench.py [--platform cpu] [--nt N] [--iters I]
"""
from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None,
                    help="override JAX platform (default: env, i.e. TPU)")
    ap.add_argument("--nt", type=int, default=1 << 22,
                    help="genome length in nucleotides")
    ap.add_argument("--iters", type=int, default=8, metavar="I",
                    help="steady-state timing iterations (>= 1)")
    ap.add_argument("--window", type=int, default=20)
    ap.add_argument("--k", type=int, default=16)
    ap.add_argument("--scale", type=int, default=200)
    args = ap.parse_args()
    if args.iters < 1:
        ap.error("--iters must be >= 1")

    import os
    if args.platform:
        os.environ["JAX_PLATFORMS"] = args.platform
    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from spaced_kmer_sketching_tpu.ops.extract import run_ids_from_lens
    from spaced_kmer_sketching_tpu.ops.sketch import sketch_from_codes
    from spaced_kmer_sketching_tpu.utils import boosthash, native
    from spaced_kmer_sketching_tpu.utils.masks import spaced_seed_mask

    window, k, scale = args.window, args.k, args.scale
    n = args.nt
    mask = spaced_seed_mask(window, k, 0)
    salt = boosthash.fmh_salt(mask.lo, mask.hi, window, 1, "modern")
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, n).astype(np.uint32)
    run_id = run_ids_from_lens([n], n)
    capacity = 1 << max(10, (max(1, 2 * n // scale)).bit_length())

    dev_codes = jnp.asarray(codes)
    dev_rid = jnp.asarray(run_id)
    dev_mask = jnp.asarray(mask.words_u32)

    def step():
        return sketch_from_codes(dev_codes, dev_rid, dev_mask, window=window,
                                 salt=salt, scale=scale, variant="modern",
                                 capacity=capacity)

    out = step()                      # compile + warm
    jax.block_until_ready(out)
    assert int(out.raw_kept) <= capacity
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = step()
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / args.iters
    windows = n - window + 1
    tpu_rate = windows / dt

    # --- CPU baseline: native C++ scalar pipeline on the same input --------
    cpu_rate = None
    if native.available():
        runs_lens = np.array([n], dtype=np.int64)
        codes8 = codes.astype(np.uint8)
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            native.sketch_codes(codes8, runs_lens, mask.lo, mask.hi,
                                window, salt, scale, False)
        cpu_dt = (time.perf_counter() - t0) / reps
        cpu_rate = windows / cpu_dt

    result = {
        "metric": "spaced_kmers_per_s_per_chip",
        "value": round(tpu_rate, 1),
        "unit": "windows/s",
        "vs_baseline": round(tpu_rate / cpu_rate, 3) if cpu_rate else None,
        "baseline_cpu_scalar_windows_per_s": round(cpu_rate, 1) if cpu_rate else None,
        "platform": jax.devices()[0].platform,
        "device": str(jax.devices()[0]),
        "nt": n, "window": window, "k": k, "scale": scale,
        "sketch_count": int(out.count),
        "step_ms": round(dt * 1e3, 3),
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
