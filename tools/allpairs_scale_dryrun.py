"""10k-genome all-pairs schedule dry-run (SURVEY.md §7 hard part 4).

Runs the blocked block-row/column schedule over virtual CPU meshes of
1/2/4/8 devices, reports pairs/s and scaling efficiency, and projects the
wall time for a 10^8-pair (10k genome) matrix on a v5e-16 slice using the
real single-chip rate from `python bench.py --mode allpairs` (pass it via
--chip-pairs-per-s).

Virtual CPU devices share this host's cores, so the efficiency measured
here is a SCHEDULE overhead check (resharding, tile launch), not a hardware
scaling claim; the per-chip rate comes from the real TPU bench.

Usage:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/allpairs_scale_dryrun.py [--genomes 512] [--cap 1024] \
      [--chip-pairs-per-s RATE]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--genomes", type=int, default=512)
    ap.add_argument("--cap", type=int, default=1024)
    ap.add_argument("--block", type=int, default=128)
    ap.add_argument("--chip-pairs-per-s", type=float, default=None)
    ap.add_argument("--engine", default="probe",
                    choices=("probe", "gram"),
                    help="probe: shard_map rect tiles over the mesh; "
                         "gram: the round-3 block-cache schedule (per-"
                         "device presorted caches, pair batches round-"
                         "robining over devices)")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    from spaced_kmer_sketching_tpu.parallel.allpairs import blocked_all_pairs
    from spaced_kmer_sketching_tpu.parallel.mesh import make_mesh

    g, cap = args.genomes, args.cap
    rng = np.random.default_rng(0)
    keys = np.full((g, cap, 4), 0xFFFFFFFF, np.uint32)
    counts = np.zeros(g, np.int32)
    pool = np.unique(rng.integers(0, 1 << 62, 2 * cap).astype(np.uint64))
    for i in range(g):
        vals = np.unique(rng.choice(pool, int(cap * 0.8)))
        counts[i] = vals.size
        keys[i, :vals.size, 0] = (vals & 0xFFFFFFFF).astype(np.uint32)
        keys[i, :vals.size, 1] = (vals >> 32).astype(np.uint32)
        keys[i, :vals.size, 2:] = 0

    devices = jax.devices()
    results = {}
    ref = None
    for nd in (1, 2, 4, 8):
        if nd > len(devices):
            break
        mesh = make_mesh(devices=devices[:nd])
        blocked_all_pairs(mesh, keys, counts, block=args.block,
                          engine=args.engine)  # compile
        t0 = time.perf_counter()
        out = blocked_all_pairs(mesh, keys, counts, block=args.block,
                                engine=args.engine)
        dt = time.perf_counter() - t0
        if ref is None:
            ref = out
        else:
            np.testing.assert_array_equal(out, ref)  # schedule determinism
        rate = g * g / dt
        results[nd] = rate
        eff = rate / (results[1] * nd)
        print(f"devices={nd}  pairs/s={rate:,.0f}  "
              f"efficiency vs 1-dev={eff:.2f}")

    if args.chip_pairs_per_s:
        per_chip = args.chip_pairs_per_s
        eff16 = 0.8  # conservative ICI-schedule assumption
        t = 1e8 / (per_chip * 16 * eff16)
        print(f"projection: 10^8 pairs on v5e-16 at {per_chip:,.0f} "
              f"pairs/s/chip, 80% eff -> {t/60:.1f} min")


if __name__ == "__main__":
    sys.exit(main())
