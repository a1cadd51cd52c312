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


@functools.partial(jax.jit, static_argnames=("window", "salt", "scale",
                                             "variant", "capacity"))
def sketch_from_codes(codes, run_id, mask_words, *, window: int, salt: int,
                      scale: int, variant: str, capacity: int) -> SketchBatch:
    """Full single-genome sketch step: extract -> FracMinHash filter -> sort
    -> unique -> compact to `capacity`.

    codes/run_id: (n,) device arrays (see ops/extract.py).
    """
    canon, valid = extract_windows(codes, run_id, window, mask_words)
    keep = valid & u64ops.fmh_keep(*canon, salt=salt, scale=scale, variant=variant)

    # Dropped windows become sentinel rows which sort to the back.
    words = [jnp.where(keep, canon[q], SENTINEL) for q in range(KEY_WORDS)]
    raw_kept = jnp.sum(keep).astype(jnp.int32)

    words, _ = _sort_rows(words)
    # Keep only the first `capacity` rows — every kept key is in this prefix
    # as long as raw_kept <= capacity (checked by the caller via raw_kept).
    words = [w[:capacity] for w in words]

    # adjacent-unique inside the prefix
    idx = lax.broadcasted_iota(jnp.int32, (capacity, 1), 0)[:, 0]
    neq_prev = jnp.zeros((capacity,), jnp.bool_)
    for q in range(KEY_WORDS):
        prev = jnp.roll(words[q], 1)
        neq_prev = neq_prev | (words[q] != prev)
    in_prefix = idx < raw_kept
    uniq = in_prefix & ((idx == 0) | neq_prev)

    count = jnp.sum(uniq).astype(jnp.int32)
    # compact unique keys to the front with one more (small) sort
    words = [jnp.where(uniq, w, SENTINEL) for w in words]
    words, _ = _sort_rows(words)
    keys = jnp.stack(words, axis=-1)  # (capacity, 4) little-endian lanes
    return SketchBatch(keys=keys, count=count, raw_kept=raw_kept)
