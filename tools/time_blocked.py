"""Phase timing for the block-cache gram schedule on the real TPU:
uploads, presorts, pair-tile program, download — at G=1024, block=128.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from spaced_kmer_sketching_tpu.utils.jaxcache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from spaced_kmer_sketching_tpu.ops.gram import (gram_pair_tiles,
                                                    pack_plan,
                                                    presort_block_packed)

    g, cap, blk = 1024, 8192, 128
    window = 20
    kbits = 40
    rng = np.random.default_rng(0)
    pool = np.unique(rng.integers(0, 1 << kbits, size=2 * cap)
                     .astype(np.uint64))
    keys_np = np.full((g, cap, 2), 0xFFFFFFFF, dtype=np.uint32)
    for i in range(g):
        shared = rng.choice(pool, size=int(cap * 0.6), replace=False)
        priv = rng.integers(0, 1 << kbits,
                            size=cap - shared.size).astype(np.uint64)
        u = np.unique(np.concatenate([shared, priv]))
        keys_np[i, :u.size, 0] = (u & 0xFFFFFFFF).astype(np.uint32)
        keys_np[i, :u.size, 1] = (u >> 32).astype(np.uint32)

    nb = g // blk
    gidbits = (2 * blk - 1).bit_length()
    pw = pack_plan(2 * window, gidbits)
    print(f"pw={pw} gidbits={gidbits} nb={nb}")

    # uploads
    t0 = time.perf_counter()
    devs = [jnp.asarray(keys_np[b * blk:(b + 1) * blk]) for b in range(nb)]
    for d in devs:
        d.block_until_ready()
    print(f"upload {nb} blocks ({keys_np.nbytes/1e6:.0f} MB): "
          f"{time.perf_counter()-t0:.3f} s")

    # presorts (first = compile)
    pre = [presort_block_packed(devs[b], key_bits=2 * window,
                                gidbits=gidbits, pw=pw) for b in range(nb)]
    np.asarray(pre[-1][0, 0, 0])
    t0 = time.perf_counter()
    pre = [presort_block_packed(devs[b], key_bits=2 * window,
                                gidbits=gidbits, pw=pw) for b in range(nb)]
    np.asarray(pre[-1][0, 0, 0])
    print(f"presort {nb} blocks: {time.perf_counter()-t0:.3f} s")

    t0 = time.perf_counter()
    cache = jnp.stack(pre)
    np.asarray(cache[0, 0, 0, 0])
    print(f"stack cache: {time.perf_counter()-t0:.3f} s shape={cache.shape}")

    pairs = [(i, j) for i in range(nb) for j in range(i, nb)]
    arr = np.array(pairs, np.int32)
    ii, jj = jnp.asarray(arr[:, 0]), jnp.asarray(arr[:, 1])

    for binner in (32, 64, 128):
        tiles = gram_pair_tiles(cache, ii, jj, block=blk, gidbits=gidbits,
                                binner=binner)
        np.asarray(tiles[-1, 0, 0])
        t0 = time.perf_counter()
        tiles = gram_pair_tiles(cache, ii, jj, block=blk, gidbits=gidbits,
                                binner=binner)
        np.asarray(tiles[-1, 0, 0])
        dt = time.perf_counter() - t0
        print(f"pair program binner={binner}: {dt:.3f} s "
              f"({dt/len(pairs)*1e3:.2f} ms/tile)")

    t0 = time.perf_counter()
    host = np.asarray(tiles)
    print(f"download tiles ({host.nbytes/1e6:.0f} MB): "
          f"{time.perf_counter()-t0:.3f} s")


if __name__ == "__main__":
    sys.exit(main())
