"""Batched sketch-set intersection counts on device.

The reference probes a hash map per element of the smaller set
(src/kmer_set.cpp:23-41).  TPU-native replacement: sketches are sorted
unique arrays, so |A ∩ B| is computed by a merge — here expressed as one
lexicographic sort of the tagged concatenation (XLA sorts are the idiomatic
TPU primitive for this): after sorting (key, tag) rows, a key present in both
sets yields an adjacent (tag=0, tag=1) pair.

All shapes are static; invalid (padding) rows carry valid=0 flags that ride
along the sort as a non-key operand.  Batched over pairs with vmap — the
all-pairs driver (parallel/allpairs.py) tiles G x G into such batches.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

KEY_WORDS = 4


def _pair_intersection(keys_a, count_a, keys_b, count_b):
    """Intersection size of two sketches (cap, 4) uint32 sorted-unique."""
    cap = keys_a.shape[0]
    idx = jnp.arange(cap, dtype=jnp.int32)
    valid_a = (idx < count_a).astype(jnp.uint32)
    valid_b = (idx < count_b).astype(jnp.uint32)

    words = [jnp.concatenate([keys_a[:, q], keys_b[:, q]]) for q in range(KEY_WORDS)]
    tag = jnp.concatenate([jnp.zeros(cap, jnp.uint32), jnp.ones(cap, jnp.uint32)])
    valid = jnp.concatenate([valid_a, valid_b])

    # sort by (w3, w2, w1, w0, tag); `valid` rides along
    out = lax.sort((words[3], words[2], words[1], words[0], tag, valid), num_keys=5)
    w3, w2, w1, w0, tag_s, valid_s = out

    eq_next = jnp.ones(2 * cap, jnp.bool_)
    for w in (w0, w1, w2, w3):
        eq_next = eq_next & (w == jnp.roll(w, -1))
    pair = (tag_s == 0) & (jnp.roll(tag_s, -1) == 1)
    both_valid = (valid_s == 1) & (jnp.roll(valid_s, -1) == 1)
    last = jnp.arange(2 * cap) == (2 * cap - 1)
    match = eq_next & pair & both_valid & (~last)
    return jnp.sum(match).astype(jnp.int32)


# vmap over a batch of pairs: keys (B, cap, 4), counts (B,)
pair_intersection_batch = jax.jit(jax.vmap(_pair_intersection))


@jax.jit
def intersection_tile(keys_rows, count_rows, keys_cols, count_cols):
    """All intersections of a (R-genome x C-genome) tile -> (R, C) int32.

    Double-vmap: rows x cols.  This is the device kernel the sharded
    all-pairs schedule calls per mesh tile.
    """
    def one_row(ka, ca):
        return jax.vmap(lambda kb, cb: _pair_intersection(ka, ca, kb, cb))(
            keys_cols, count_cols)
    return jax.vmap(one_row)(keys_rows, count_rows)
