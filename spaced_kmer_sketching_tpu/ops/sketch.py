"""FracMinHash sketch construction: filter + sort + dedup, all on device.

Replaces the reference's hash-map dedup (src/kmer.hpp:160-190) with a
TPU-native formulation: a sketch is a SORTED UNIQUE array of 128-bit keys
(4 x uint32 lanes) padded to a static capacity with all-ones sentinel rows,
plus a count.  Sorted arrays make intersection a merge instead of hash
probing and batch trivially across genomes.

Dedup uses XLA's multi-operand lexicographic sort (lax.sort, num_keys=4) —
the idiomatic way to sort wide keys on TPU.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from . import u64ops
from .extract import extract_windows

SENTINEL = jnp.uint32(0xFFFFFFFF)
KEY_WORDS = 4


class SketchBatch(NamedTuple):
    """A batch of sketches: keys (..., cap, 4) uint32 sorted ascending with
    sentinel padding; count (...,) int32 unique keys; raw_kept (...,) int32
    pre-dedup kept windows (for capacity-overflow detection)."""
    keys: jnp.ndarray
    count: jnp.ndarray
    raw_kept: jnp.ndarray


def _sort_rows(words, extra=()):
    """Ascending 128-bit lexicographic sort. `words` little-endian lanes."""
    # most-significant word first for lexicographic order
    operands = (words[3], words[2], words[1], words[0]) + tuple(extra)
    out = lax.sort(operands, num_keys=4)
    w3, w2, w1, w0 = out[:4]
    return [w0, w1, w2, w3], out[4:]


def sketch_core(codes, run_id, mask_words, *, window: int, salt,
                scale: int, variant: str, capacity: int) -> SketchBatch:
    """Full single-genome sketch step: extract -> FracMinHash filter -> sort
    -> unique -> compact to `capacity`.

    codes/run_id: (n,) device arrays (see ops/extract.py).  `salt` is either
    a static python int or a traced (hi, lo) uint32 pair — the latter lets
    multi-seed sketching vmap over (mask, salt) without recompiling.
    Not jitted: compose under jit/vmap/shard_map.
    """
    canon, valid = extract_windows(codes, run_id, window, mask_words)
    keep = valid & u64ops.fmh_keep(*canon, salt=salt, scale=scale, variant=variant)

    # Compact survivors (~1/scale of windows) into the static `capacity`
    # buffer: rank each window (kept -> its position, dropped -> MAX), pick
    # the `capacity` best ranks with top_k (TPU-fast partial sort; scatters
    # serialize on TPU and a full n-row sort is O(n log n) on 4-word keys),
    # then gather the 4 key lanes at those indices.  Every kept key lands in
    # the buffer as long as raw_kept <= capacity (the caller checks via
    # raw_kept and retries bigger on overflow).
    raw_kept = jnp.sum(keep).astype(jnp.int32)
    nw = keep.shape[0]
    pos = lax.broadcasted_iota(jnp.int32, (nw, 1), 0)[:, 0]
    rank = jnp.where(keep, pos, jnp.int32(0x7FFFFFFF))
    k_top = min(capacity, nw)
    neg_rank, idx = lax.top_k(-rank, k_top)
    kept_valid = neg_rank != -0x7FFFFFFF
    words = [jnp.where(kept_valid, canon[q][idx], SENTINEL)
             for q in range(KEY_WORDS)]
    if k_top < capacity:
        pad = jnp.full((capacity - k_top,), SENTINEL)
        words = [jnp.concatenate([w, pad]) for w in words]
    # sort only the small buffer to establish the sorted-unique invariant
    words, _ = _sort_rows(words)

    # adjacent-unique inside the prefix
    idx = lax.broadcasted_iota(jnp.int32, (capacity, 1), 0)[:, 0]
    neq_prev = jnp.zeros((capacity,), jnp.bool_)
    for q in range(KEY_WORDS):
        prev = jnp.roll(words[q], 1)
        neq_prev = neq_prev | (words[q] != prev)
    in_prefix = idx < raw_kept
    uniq = in_prefix & ((idx == 0) | neq_prev)

    count = jnp.sum(uniq).astype(jnp.int32)
    keys = jnp.stack(_compact_unique(words, uniq, idx), axis=-1)
    return SketchBatch(keys=keys, count=count, raw_kept=raw_kept)


def _compact_unique(words, uniq, idx):
    """Compact rows flagged `uniq` to the front, preserving sorted order —
    top_k over ranks + gather, NOT another 4-lane sort (the sort was ~half
    the sketch step's runtime on TPU)."""
    capacity = uniq.shape[0]
    rank = jnp.where(uniq, idx, jnp.int32(0x7FFFFFFF))
    neg, take = lax.top_k(-rank, capacity)   # ascending rank order
    ok = neg != -0x7FFFFFFF
    return [jnp.where(ok, w[take], SENTINEL) for w in words]


@functools.partial(jax.jit, static_argnames=("window", "salt", "scale",
                                             "variant", "capacity"))
def sketch_from_codes(codes, run_id, mask_words, *, window: int, salt: int,
                      scale: int, variant: str, capacity: int) -> SketchBatch:
    """Jitted single-genome sketch step (static salt)."""
    return sketch_core(codes, run_id, mask_words, window=window, salt=salt,
                       scale=scale, variant=variant, capacity=capacity)


def merge_sketches(keys, counts, capacity: int) -> SketchBatch:
    """Merge S sorted-unique sketches into one: keys (S, cap, 4) uint32,
    counts (S,) int32 -> SketchBatch with `capacity` rows.

    Used to combine per-chunk sketches from sequence-parallel extraction and
    per-chip partial sketches in the multi-host path.  Not jitted: compose
    under jit/shard_map.
    """
    s, cap = keys.shape[0], keys.shape[1]
    n = s * cap
    flat = keys.reshape(n, KEY_WORDS)
    idx_in = lax.broadcasted_iota(jnp.int32, (s, cap), 1)
    valid = (idx_in < counts[:, None]).reshape(n)
    words = [jnp.where(valid, flat[:, q], SENTINEL) for q in range(KEY_WORDS)]
    total = jnp.sum(counts).astype(jnp.int32)

    words, _ = _sort_rows(words)
    if n < capacity:
        pad = jnp.full((capacity - n,), SENTINEL)
        words = [jnp.concatenate([w, pad]) for w in words]
    else:
        words = [w[:capacity] for w in words]
    idx = lax.broadcasted_iota(jnp.int32, (capacity, 1), 0)[:, 0]
    neq_prev = jnp.zeros((capacity,), jnp.bool_)
    for q in range(KEY_WORDS):
        neq_prev = neq_prev | (words[q] != jnp.roll(words[q], 1))
    uniq = (idx < total) & ((idx == 0) | neq_prev)
    count = jnp.sum(uniq).astype(jnp.int32)
    keys = jnp.stack(_compact_unique(words, uniq, idx), axis=-1)
    return SketchBatch(keys=keys, count=count, raw_kept=total)


@functools.partial(jax.jit, static_argnames=("window", "scale", "variant",
                                             "capacity"))
def sketch_from_codes_multiseed(codes, run_id, masks_words, salt_pairs, *,
                                window: int, scale: int, variant: str,
                                capacity: int) -> SketchBatch:
    """Fused multi-seed sketching: S spaced seeds evaluated over one genome
    in a single compiled program (the EP analog of SURVEY.md §2.1 — "experts"
    = seeds, all dense; BASELINE.json config 3).

    masks_words: (S, 4) uint32; salt_pairs: (S, 2) uint32 [hi, lo] rows.
    Returns a SketchBatch with a leading S axis.
    """
    def one(mask_w, sp):
        return sketch_core(codes, run_id, mask_w, window=window,
                           salt=(sp[0], sp[1]), scale=scale, variant=variant,
                           capacity=capacity)
    return jax.vmap(one)(masks_words, salt_pairs)
