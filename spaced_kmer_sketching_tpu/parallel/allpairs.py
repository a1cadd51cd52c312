"""Sharded all-pairs sketch intersections: 2-D tiling over the device mesh.

The reference parallelizes the O(G^2) pair loop with `cilk_for`
(src/kmer_set.cpp:167-184).  Here the (G x G) intersection matrix is tiled
over the ("r", "c") mesh: device (i, j) receives row-block i (sharded over
"r") and column-block j (sharded over "c") of the stacked sketch array and
computes its tile with the batched merge-intersection kernel — XLA inserts
the all-gathers implied by the two different shardings of the same operand,
and they ride ICI.

ANI math stays on device (f32) for the throughput path; the CSV/parity path
recomputes containment/ANI in host f64 (ani.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ops.intersect import intersection_tile
from .mesh import COL_AXIS, ROW_AXIS


def sharded_all_pairs_fn(mesh: Mesh):
    """Jitted (keys (G, cap, 4), counts (G,)) -> (G, G) int32 intersections,
    G divisible by both mesh axis sizes; output sharded (r, c)."""
    def tile(keys_r, counts_r, keys_c, counts_c):
        return intersection_tile(keys_r, counts_r, keys_c, counts_c)

    sharded = shard_map(
        tile, mesh=mesh,
        in_specs=(P(ROW_AXIS), P(ROW_AXIS), P(COL_AXIS), P(COL_AXIS)),
        out_specs=P(ROW_AXIS, COL_AXIS))

    @jax.jit
    def run(keys, counts):
        return sharded(keys, counts, keys, counts)
    return run


def sharded_ani_fn(mesh: Mesh, care_positions: int):
    """Jitted (keys, counts) -> (inter (G, G) int32, ani (G, G) f32) with the
    reference's containment/estimator semantics on device
    (src/ani_estimation.cpp:24-42; denominator = row genome's sketch size,
    the FIRST of the ordered pair per src/kmer-sketching.cpp:198)."""
    pairs = sharded_all_pairs_fn(mesh)
    inv_k = 1.0 / float(care_positions)

    @jax.jit
    def run(keys, counts):
        inter = pairs(keys, counts)
        c = jnp.where(inter == 0, 0.0,
                      inter.astype(jnp.float32)
                      / jnp.maximum(counts[:, None], 1).astype(jnp.float32))
        ani = jnp.where(c <= 0, 0.0, jnp.power(c, inv_k))
        return inter, ani
    return run
