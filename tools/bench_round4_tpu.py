"""One-process round-4 TPU measurement batch.

The tunnel charges a multi-minute per-process startup/program-load stall
under load, so separate bench.py invocations each pay it; this script runs
every round-4 e2e measurement in ONE process (cold then warm per config)
and prints each JSON line as it lands.

Usage: python tools/bench_round4_tpu.py [--skip-big]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def ns(**kw):
    base = dict(platform=None, nt=1_550_000, iters=1, window=20, k=16,
                scale=200, mode="e2e", genomes=1024, seeds=8,
                segment_nt=1 << 24, batch=8, no_verify=False,
                steps_per_dispatch=16, probe=False, bucket=False,
                blocked=False, block_size=256, pair_batch=256,
                ondevice=False, e2e_source="device", dispatch=128)
    base.update(kw)
    return argparse.Namespace(**base)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-big", action="store_true")
    ap.add_argument("--genomes-big", type=int, default=10240)
    args = ap.parse_args()

    import bench

    for label, g in [("G=1024 cold", 1024), ("G=1024 warm", 1024)] + (
            [] if args.skip_big else
            [(f"G={args.genomes_big} cold", args.genomes_big),
             (f"G={args.genomes_big} warm", args.genomes_big)]):
        t0 = time.perf_counter()
        print(f"--- e2e device {label} ---", flush=True)
        rc = bench.bench_e2e(ns(genomes=g))
        print(f"--- {label} done rc={rc} outer_wall="
              f"{time.perf_counter() - t0:.1f}s ---", flush=True)


if __name__ == "__main__":
    main()
