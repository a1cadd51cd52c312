"""Pallas TPU bitonic sort for 128-bit keys (4 x uint32 lanes).

XLA's `lax.sort` with 4 key operands is the dominant cost of the sketch step
(multi-operand comparator sorts lower poorly on TPU).  This kernel runs the
classic bitonic network entirely in VMEM on the VPU:

  * keys live as four (R, 128) uint32 planes, flat index i = r * 128 + l;
  * a compare-exchange at distance d is two `pltpu.roll`s + a 128-bit
    lexicographic compare + selects — d < 128 rolls lanes, d >= 128 rolls
    sublanes (bitonic distances are powers of two, so exactly one of the two
    cases applies and the XOR partner i^d is reachable by +/-d rolls);
  * the full network for N rows is log2(N)*(log2(N)+1)/2 unrolled passes.

Sorts ascending with all-ones sentinel padding sorting to the back — the
invariant ops/sketch.py needs.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
KEY_WORDS = 4


def _partner(x, d: int):
    """x[i ^ d] over the flattened (R, 128) plane, d a power of two."""
    if d < LANES:
        fwd = pltpu.roll(x, LANES - d, 1)   # x[r, (l+d) % 128]
        bwd = pltpu.roll(x, d, 1)           # x[r, (l-d) % 128]
        lane = lax.broadcasted_iota(jnp.int32, x.shape, 1)
        return jnp.where((lane & d) == 0, fwd, bwd)
    e = d // LANES
    rows = x.shape[0]
    fwd = pltpu.roll(x, rows - e, 0)
    bwd = pltpu.roll(x, e, 0)
    row = lax.broadcasted_iota(jnp.int32, x.shape, 0)
    return jnp.where((row & e) == 0, fwd, bwd)


def _lex_lt(a, b):
    lt = a[0] < b[0]
    for q in range(1, KEY_WORDS):
        lt = (a[q] < b[q]) | ((a[q] == b[q]) & lt)
    return lt


def _sort_kernel(n: int, w0, w1, w2, w3, o0, o1, o2, o3):
    x = [w0[:], w1[:], w2[:], w3[:]]
    shape = x[0].shape
    row = lax.broadcasted_iota(jnp.int32, shape, 0)
    lane = lax.broadcasted_iota(jnp.int32, shape, 1)
    flat = row * LANES + lane

    stages = n.bit_length() - 1
    for k in range(1, stages + 1):
        # ascending iff bit k of the flat index is 0 (bitonic block 2^k);
        # at the final stage the bit is always 0, giving one ascending run
        asc = (flat & (1 << k)) == 0
        for j in range(k - 1, -1, -1):
            d = 1 << j
            p = [_partner(w, d) for w in x]
            x_lt_p = _lex_lt(x, p)
            lower = (flat & d) == 0
            take_min = lower == asc
            # min/max of (x, partner) per word, chosen by take_min
            want_x = take_min == x_lt_p   # keep own value?
            # tie (x == p): x_lt_p False -> want_x = ~take_min; both equal, fine
            x = [jnp.where(want_x, xi, pi) for xi, pi in zip(x, p)]
    o0[:], o1[:], o2[:], o3[:] = x


@functools.partial(jax.jit, static_argnames=("interpret",))
def bitonic_sort_128(keys, interpret: bool = False):
    """Sort (N, 4) uint32 128-bit rows ascending; N a power of two >= 256
    and a multiple of 1024 (so planes are (N/128, 128))."""
    n = keys.shape[0]
    assert n & (n - 1) == 0 and n >= 1024, "N must be a power of two >= 1024"
    r = n // LANES
    planes = [keys[:, q].reshape(r, LANES) for q in range(KEY_WORDS)]
    kern = functools.partial(_sort_kernel, n)
    outs = pl.pallas_call(
        kern,
        out_shape=[jax.ShapeDtypeStruct((r, LANES), jnp.uint32)] * KEY_WORDS,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * KEY_WORDS,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * KEY_WORDS,
        interpret=interpret,
    )(*planes)
    return jnp.stack([o.reshape(n) for o in outs], axis=-1)
