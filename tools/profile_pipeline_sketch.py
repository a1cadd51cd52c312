"""A/B the pipeline's compact sketch dispatch against the bench's
prepacked dispatch at identical shapes, all inputs device-resident.

Explains the VERDICT r4 finding: config-4 pipeline sketch phase ran at
2.76e9 windows/s vs the 5.41e9 standalone bench rate.  Usage:

    python tools/profile_pipeline_sketch.py [--trace DIR]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from spaced_kmer_sketching_tpu.config import SketchConfig
from spaced_kmer_sketching_tpu.models.fracminhash import FracMinHashSketcher
from spaced_kmer_sketching_tpu.ops.pallas.extract import packed_body
from spaced_kmer_sketching_tpu.ops.sketch import (
    jitted_sketch_batch_compact, jitted_sketch_batch_packed)

ap = argparse.ArgumentParser()
ap.add_argument("--nt", type=int, default=1_550_000)
ap.add_argument("--window", type=int, default=20)
ap.add_argument("--k", type=int, default=16)
ap.add_argument("--iters", type=int, default=10)
ap.add_argument("--trace", default=None)
ap.add_argument("--trace-packed", action="store_true")
args = ap.parse_args()

n, w = args.nt, args.window
cfg = SketchConfig(window=w, k=args.k, scale=200)
sk = FracMinHashSketcher(cfg)
nw = n - w + 1
cap = cfg.capacity_for(nw)
body = packed_body(n)
print(f"n={n} nw={nw} cap={cap} body={body}")

rng = np.random.default_rng(0)


def time_fn(label, fn, fn_args, g):
    out = fn(*fn_args)
    np.asarray(out.count)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = fn(*fn_args)
    np.asarray(out.count)
    dt = (time.perf_counter() - t0) / args.iters
    rate = g * nw / dt
    print(f"{label:34s} g={g:4d}  {dt*1e3:8.2f} ms  {rate:.3e} windows/s")
    return out, dt


def compact_args(g):
    p = jnp.asarray(rng.integers(0, 2**32, (g, body // 16), dtype=np.uint64)
                    .astype(np.uint32))
    bounds = jnp.full((g, 8), body, jnp.int32)
    rid0 = jnp.zeros(g, jnp.int32)
    vlen = jnp.full(g, n, jnp.int32)
    return (p, bounds, rid0, vlen, sk._mask_words)


results = {}
for g in (32, 128):
    fn = jitted_sketch_batch_compact(n, w, sk.salt, cfg.scale,
                                     cfg.hash_variant, cap)
    results[f"compact_g{g}"] = time_fn("compact (pipeline path)", fn,
                                       compact_args(g), g)

# prepacked path: build the planes on device once (not timed), then time
# the kernel exactly as the bench does
from spaced_kmer_sketching_tpu.ops.pallas.extract import _LEAD, LANES
from spaced_kmer_sketching_tpu.ops.bitops import _rev32_2bit

for g in (32, 128):
    p, bounds, rid0, vlen, mw = compact_args(g)
    lead32 = jnp.zeros((g, _LEAD), jnp.uint32)
    qc = jnp.concatenate([lead32, jnp.repeat(~p, 16, axis=1)], axis=1)
    qr = jnp.concatenate([lead32, jnp.repeat(_rev32_2bit(p), 16, axis=1)],
                         axis=1)
    pos = jnp.arange(body)[None, :]
    rid = jnp.where(pos < vlen[:, None], 0, -1).astype(jnp.int32)
    rid = jnp.concatenate([jnp.full((g, _LEAD), -1, jnp.int32), rid], axis=1)
    qc = jax.block_until_ready(qc.reshape(g, -1, LANES))
    qr = jax.block_until_ready(qr.reshape(g, -1, LANES))
    rid = jax.block_until_ready(rid.reshape(g, -1, LANES))
    fn = jitted_sketch_batch_packed(n, w, sk.salt, cfg.scale,
                                    cfg.hash_variant, cap)
    results[f"packed_g{g}"] = time_fn("prepacked (bench path)", fn,
                                      (qc, qr, rid, mw), g)

if args.trace:
    g = 128
    if args.trace_packed:
        p, bounds, rid0, vlen, mw = compact_args(g)
        lead32 = jnp.zeros((g, _LEAD), jnp.uint32)
        qc = jnp.concatenate([lead32, jnp.repeat(~p, 16, axis=1)], axis=1)
        qr = jnp.concatenate(
            [lead32, jnp.repeat(_rev32_2bit(p), 16, axis=1)], axis=1)
        pos = jnp.arange(body)[None, :]
        rid = jnp.where(pos < vlen[:, None], 0, -1).astype(jnp.int32)
        rid = jnp.concatenate([jnp.full((g, _LEAD), -1, jnp.int32), rid],
                              axis=1)
        a = (jax.block_until_ready(qc.reshape(g, -1, LANES)),
             jax.block_until_ready(qr.reshape(g, -1, LANES)),
             jax.block_until_ready(rid.reshape(g, -1, LANES)), mw)
        fn = jitted_sketch_batch_packed(n, w, sk.salt, cfg.scale,
                                        cfg.hash_variant, cap)
    else:
        fn = jitted_sketch_batch_compact(n, w, sk.salt, cfg.scale,
                                         cfg.hash_variant, cap)
        a = compact_args(g)
    out = fn(*a)
    np.asarray(out.count)
    with jax.profiler.trace(args.trace):
        for _ in range(3):
            out = fn(*a)
        np.asarray(out.count)
    print(f"trace written to {args.trace}")
