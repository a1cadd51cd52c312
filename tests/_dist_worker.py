"""Worker for test_distributed_multiprocess: one process of a 2-process
jax.distributed CPU job running the mesh driver end-to-end.

Launched by the parent test with JAX_COORDINATOR_ADDRESS /
JAX_NUM_PROCESSES / JAX_PROCESS_ID / JAX_PLATFORMS / XLA_FLAGS in the
environment — init_distributed() reads them, which is exactly the
production multi-host wiring (parallel/distributed.py).  argv:
OUTPUT_CSV WINDOW K SCALE FASTA...
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import jax
    jax.config.update("jax_platforms", "cpu")

    from spaced_kmer_sketching_tpu.parallel.distributed import (
        global_mesh, init_distributed)
    init_distributed()
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 2 * len(jax.local_devices())

    from spaced_kmer_sketching_tpu.config import SketchConfig
    from spaced_kmer_sketching_tpu.driver import run_experiment
    from spaced_kmer_sketching_tpu.parallel.sketcher import MeshSketcher

    out_csv, window, k, scale = (sys.argv[1], int(sys.argv[2]),
                                 int(sys.argv[3]), int(sys.argv[4]))
    fastas = sys.argv[5:]
    cfg = SketchConfig(window=window, k=k, scale=scale)
    mesh = global_mesh()
    run_experiment(window, k, fastas, out_csv, False, config=cfg,
                   make_sketcher=lambda c: MeshSketcher(c, mesh),
                   echo_timings=False)
    print("WORKER_OK", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
