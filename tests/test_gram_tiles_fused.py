"""Exactness of the fused VMEM tile scan (ops/pallas/gram_tiles.py).

The fused kernel must be bit-equal to the XLA chunk scan
(ops/gram._gram_chunks_packed) — both compute exact integer pair
intersections, so equality is exact, not approximate.  Streams are built
to exercise the boundary machinery: small key universes force multi-entry
runs that straddle chunk (128-entry) and grid-step (sb*128-entry)
boundaries, including runs spanning >= 3 chunks.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spaced_kmer_sketching_tpu.ops import gram
from spaced_kmer_sketching_tpu.ops.pallas.gram_tiles import (
    gram_tile_scan_fused, tile_meta)


def _stream(rng, g, cap, key_bits, gidbits, universe_size):
    """Random sorted packed (key, gid) stream + per-genome key sets.
    Keys draw from the FULL key_bits range (both uint32 words live for
    key_bits > 32) so multi-plane packing carries real entropy."""
    pw = gram.pack_plan(key_bits, gidbits)
    keys = np.full((g, cap, 2), 0xFFFFFFFF, np.uint32)
    counts = rng.integers(0, cap + 1, size=g)
    universe = rng.choice(1 << min(key_bits, 60), size=universe_size,
                          replace=False).astype(np.uint64)
    sets = []
    for i in range(g):
        ks = np.sort(rng.choice(universe, size=min(counts[i], universe.size),
                                replace=False))
        counts[i] = ks.size
        keys[i, :ks.size, 0] = (ks & 0xFFFFFFFF).astype(np.uint32)
        keys[i, :ks.size, 1] = (ks >> np.uint64(32)).astype(np.uint32)
        sets.append(set(ks.tolist()))
    kj = jnp.asarray(keys)
    gid = jnp.broadcast_to(jnp.arange(g, dtype=jnp.uint32)[:, None],
                           (g, cap))
    kw = min(2, gram._guard_words(key_bits))
    planes = gram._pack_gid_planes(kj[:, :, :kw], gid, key_bits, gidbits, pw)
    n = g * cap
    srt = jax.lax.sort(tuple(p.reshape(n) for p in planes[::-1]),
                       num_keys=pw)
    return list(srt[::-1]), sets


@pytest.mark.parametrize("seed,g,cap,key_bits,universe", [
    (0, 8, 256, 20, 128),      # dense runs, straddling everywhere
    (1, 16, 128, 16, 64),      # tiny universe -> long runs (>= 3 chunks)
    (2, 8, 256, 33, 1024),     # pw = 2 live words, sparse runs
    (3, 4, 512, 24, 16),       # runs up to 4 long crossing sb boundaries
    (4, 8, 256, 60, 128),      # pw = 3 packed planes (window >= 28 shape:
                               # 60 key bits + 5 gid bits + guard > 64)
])
def test_fused_matches_xla_and_brute(seed, g, cap, key_bits, universe):
    rng = np.random.default_rng(seed)
    gidbits = max(2, (g - 1).bit_length() + 1)
    sw, sets = _stream(rng, g, cap, key_bits, gidbits, universe)
    gp = 256
    ref = np.asarray(gram._gram_chunks_packed(sw, gidbits, gp, 128,
                                              binner=8))
    fused = np.asarray(gram_tile_scan_fused(sw, gidbits, gp, sb=8,
                                            interpret=True))
    assert np.array_equal(ref, fused)
    if seed == 0:
        # sb that does not divide the chunk-row count exercises the
        # sentinel-padding path (pad rows contribute nothing)
        fused5 = np.asarray(gram_tile_scan_fused(sw, gidbits, gp, sb=5,
                                                 interpret=True))
        assert np.array_equal(ref, fused5)
    rect = np.asarray(gram_tile_scan_fused(sw, gidbits, gp, split=128,
                                           sb=8, interpret=True))
    assert np.array_equal(ref[:128, 128:], rect)
    brute = np.array([[len(a & b) for b in sets] for a in sets], np.int64)
    assert np.array_equal(ref[:g, :g].astype(np.int64), brute)


def test_meta_plane_fields():
    """gid/rid/flag extraction on a hand-built 2-chunk stream."""
    gidbits = 4
    pw = gram.pack_plan(20, gidbits)
    # 256 entries: key i//2 (every key twice, gids alternate 0/1)
    keys = np.repeat(np.arange(128, dtype=np.uint64), 2)
    gids = np.tile(np.array([0, 1], np.uint32), 128)
    kj = jnp.stack([jnp.asarray(keys.astype(np.uint32)),
                    jnp.zeros(256, jnp.uint32)], axis=-1)
    planes = gram._pack_gid_planes(kj, jnp.asarray(gids), 20, gidbits, pw)
    sw = [p.reshape(256) for p in planes]
    meta = np.asarray(tile_meta(sw, gidbits)).reshape(-1)
    from spaced_kmer_sketching_tpu.ops.pallas.gram_tiles import (
        BND_BIT, EQL_BIT, EQP_BIT, GID_SENT)
    gid = meta & GID_SENT
    bnd = (meta >> BND_BIT) & 1
    assert np.array_equal(gid, gids)
    # runs of 2 -> a boundary at every even local index (and at lane 0)
    assert np.array_equal(bnd, (np.arange(256) % 2 == 0).astype(np.int64))
    # chunk 0: last key = 63 -> entries 126, 127 flagged eql
    eql = (meta >> EQL_BIT) & 1
    assert eql[126] == 1 and eql[127] == 1 and eql[:126].sum() == 0
    # chunk 1 starts a fresh run (key 64) -> no eqp flags anywhere
    eqp = (meta >> EQP_BIT) & 1
    assert eqp.sum() == 0


def test_straddle_run_correction():
    """A single key shared by every genome spans many chunks: the open-run
    carry must add the cross-chunk products exactly once."""
    g, cap, key_bits = 8, 128, 20
    gidbits = 4
    pw = gram.pack_plan(key_bits, gidbits)
    keys = np.full((g, cap, 2), 0xFFFFFFFF, np.uint32)
    # every genome holds keys {1..96}: runs of length 8 = entries 8..775
    for i in range(g):
        keys[i, :96, 0] = np.arange(1, 97, dtype=np.uint32)
        keys[i, :96, 1] = 0
    kj = jnp.asarray(keys)
    gid = jnp.broadcast_to(jnp.arange(g, dtype=jnp.uint32)[:, None],
                           (g, cap))
    planes = gram._pack_gid_planes(kj[:, :, :2], gid, key_bits, gidbits, pw)
    n = g * cap
    srt = jax.lax.sort(tuple(p.reshape(n) for p in planes[::-1]),
                       num_keys=pw)
    sw = list(srt[::-1])
    out = np.asarray(gram_tile_scan_fused(sw, gidbits, 128, sb=8,
                                          interpret=True))
    assert np.array_equal(out[:g, :g], np.full((g, g), 96.0))


def test_wired_into_ondevice_gram():
    """gram_all_pairs_ondevice routes through the fused kernel in
    interpret mode (the gate accepts interpret) and stays exact."""
    rng = np.random.default_rng(7)
    g, cap = 8, 256
    keys = np.full((g, cap, 4), 0xFFFFFFFF, np.uint32)
    sets = []
    for i in range(g):
        c = int(rng.integers(1, cap))
        ks = np.sort(rng.choice(1 << 20, size=c, replace=False))
        keys[i, :c, 0] = ks.astype(np.uint32)
        keys[i, :c, 1:] = 0
        sets.append(set(ks.tolist()))
    counts = np.array([len(s) for s in sets], np.int32)
    out = np.asarray(gram.gram_all_pairs_ondevice(
        jnp.asarray(keys), jnp.asarray(counts), key_words=2, key_bits=40,
        interpret=True))
    brute = np.array([[len(a & b) for b in sets] for a in sets], np.int64)
    assert np.array_equal(out[:g, :g].astype(np.int64), brute)


def test_fused_under_shard_map():
    """gram_pair_tiles with the fused kernel composes with shard_map
    (device-varying tile indices against a replicated cache) and stays
    exact.  check_vma=False here: interpret-mode pallas inlines the kernel
    as jax ops whose scratch/constant values are unvarying, which trips
    the vma checker even though the compiled Mosaic path is fine — the
    strict-vma composition (pallas out_shapes declaring varying axes via
    ops/pallas/sort._sds) is
    verified on real hardware (mesh_all_pairs_packed, BASELINE_RESULTS)."""
    import jax
    from jax.sharding import Mesh, PartitionSpec as P

    rng = np.random.default_rng(11)
    block, cap, key_bits, gidbits = 128, 256, 40, 8
    pw = gram.pack_plan(key_bits, gidbits)
    nb = 2
    slab = np.full((nb * block, cap, 2), 0xFFFFFFFF, np.uint32)
    for i in range(nb * block):
        c = int(rng.integers(1, cap))
        ks = np.sort(rng.choice(1 << 22, size=c, replace=False)) \
            .astype(np.uint64)
        slab[i, :c, 0] = (ks & 0xFFFFFFFF).astype(np.uint32)
        slab[i, :c, 1] = (ks >> 32).astype(np.uint32)
    cache = gram.presort_blocks_packed(
        jnp.asarray(slab), block=block, key_bits=key_bits,
        gidbits=gidbits, pw=pw, interpret=True)
    devs = jax.devices()
    nd = 2 if len(devs) >= 2 else 1
    mesh = Mesh(np.array(devs[:nd]), ("d",))
    ii = jnp.array([0, 1] * nd, jnp.int32)
    jj = jnp.array([1, 1] * nd, jnp.int32)

    def local(cache, ii, jj):
        return gram.gram_pair_tiles(cache, ii, jj, block=block,
                                    gidbits=gidbits, interpret=True,
                                    vary_axes=("d",))

    fn = jax.shard_map(local, mesh=mesh, in_specs=(P(), P("d"), P("d")),
                       out_specs=P("d"), check_vma=False)
    tiles = np.asarray(jax.jit(fn)(cache, ii, jj))
    direct = np.asarray(gram.gram_pair_tiles(cache, ii[:2], jj[:2],
                                             block=block, gidbits=gidbits,
                                             interpret=True))
    assert np.array_equal(tiles[:2], direct)
