"""Time the batched macro-tile path (presort cache -> gram_pair_tiles) on
the real chip, with optional profiler trace and fused-vs-XLA A/B.

This is the micro-benchmark behind the round-4 fused tile-scan numbers
(BASELINE_RESULTS.md): a synthetic sorted stream at the config-4 tile
shape (two 128-genome blocks x cap 8192, ~2.1M entries/tile), 32 tiles
per dispatch.  The A/B must run each engine in a FRESH process (the env
knob is read at import and jit caches key on code, not the knob):

  python tools/time_tiles.py                     # fused (default)
  SKS_TILE_SCAN=xla python tools/time_tiles.py   # XLA chunk scan
  python tools/time_tiles.py --trace             # + /tmp/sks_trace dump
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cap", type=int, default=8192)
    ap.add_argument("--block", type=int, default=128)
    ap.add_argument("--tiles", type=int, default=32)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--density", type=float, default=0.9)
    ap.add_argument("--trace", action="store_true")
    args = ap.parse_args()

    from spaced_kmer_sketching_tpu.utils.jaxcache import (
        enable_compilation_cache)
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from spaced_kmer_sketching_tpu.ops import gram

    rng = np.random.default_rng(3)
    block, cap, key_bits = args.block, args.cap, 40
    gidbits = max(1, (2 * block - 1).bit_length())
    pw = gram.pack_plan(key_bits, gidbits)
    nb = 2
    slab = np.full((nb * block, cap, 2), 0xFFFFFFFF, np.uint32)
    for i in range(nb * block):
        c = int(cap * args.density)
        ks = np.sort(rng.choice(1 << 30, size=c, replace=False)) \
            .astype(np.uint64)
        slab[i, :c, 0] = (ks & 0xFFFFFFFF).astype(np.uint32)
        slab[i, :c, 1] = (ks >> 32).astype(np.uint32)
    cache = gram.presort_blocks_packed(
        jnp.asarray(slab), block=block, key_bits=key_bits,
        gidbits=gidbits, pw=pw)
    jax.block_until_ready(cache)
    p = args.tiles
    ii = jnp.zeros((p,), jnp.int32)
    jj = jnp.ones((p,), jnp.int32)

    def run():
        return gram.gram_pair_tiles(cache, ii, jj, block=block,
                                    gidbits=gidbits, binner=256,
                                    out_dtype=jnp.int16)

    out = run()
    float(jnp.sum(out.astype(jnp.int32)))        # forced completion
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = run()
    float(jnp.sum(out.astype(jnp.int32)))
    dt = (time.perf_counter() - t0) / args.iters
    # report the engine the gate ACTUALLY picked (the knob alone would
    # mislabel fallback shapes, e.g. --block 1024 -> gp 2048 -> xla)
    engine = ("fused" if gram._use_fused_scan(128, gidbits, 2 * block,
                                              False) else "xla")
    print(f"engine={engine} backend={jax.default_backend()} "
          f"{p} tiles/dispatch: {dt * 1e3:.2f} ms total, "
          f"{dt / p * 1e3:.3f} ms/tile")
    if args.trace:
        import shutil
        shutil.rmtree("/tmp/sks_trace", ignore_errors=True)
        with jax.profiler.trace("/tmp/sks_trace"):
            out = run()
            float(jnp.sum(out.astype(jnp.int32)))
        print("trace in /tmp/sks_trace (parse with tools/parse_trace.py)")


if __name__ == "__main__":
    main()
