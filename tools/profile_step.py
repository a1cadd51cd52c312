"""Profile the batched sketch step on TPU: trace one steady-state iteration
and print the top ops by self-duration (parsed from the .trace.json.gz)."""
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from spaced_kmer_sketching_tpu.utils.jaxcache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from spaced_kmer_sketching_tpu.ops.extract import run_ids_from_lens
    from spaced_kmer_sketching_tpu.ops.sketch import jitted_sketch_batch
    from spaced_kmer_sketching_tpu.utils import boosthash
    from spaced_kmer_sketching_tpu.utils.masks import spaced_seed_mask

    window, k, scale, n, g = 20, 16, 200, 1 << 21, 8
    mask = spaced_seed_mask(window, k, 0)
    salt = boosthash.fmh_salt(mask.lo, mask.hi, window, 1, "modern")
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, (g, n)).astype(np.uint32)
    run_id = np.stack([run_ids_from_lens([n], n)] * g)
    capacity = 1 << max(10, (max(1, 2 * n // scale)).bit_length())
    from spaced_kmer_sketching_tpu.ops.pallas.extract import pack_genomes_np
    from spaced_kmer_sketching_tpu.ops.sketch import jitted_sketch_batch_packed
    qc, qr, rid2 = pack_genomes_np(codes, run_id)
    dev_args = (jnp.asarray(qc), jnp.asarray(qr), jnp.asarray(rid2))
    dev_mask = jnp.asarray(mask.words_u32)
    fn = jitted_sketch_batch_packed(n, window, salt, scale, "modern",
                                    capacity)
    out = fn(*dev_args, dev_mask)
    np.asarray(out.count)

    tdir = "/tmp/sks_trace"
    os.system(f"rm -rf {tdir}")
    with jax.profiler.trace(tdir):
        for _ in range(4):
            out = fn(*dev_args, dev_mask)
        np.asarray(out.count)

    traces = glob.glob(f"{tdir}/**/*.trace.json.gz", recursive=True)
    assert traces, "no trace found"
    ev = json.load(gzip.open(traces[0]))["traceEvents"]
    # TPU op events live on device-thread tracks; aggregate by name
    dur = defaultdict(float)
    cnt = defaultdict(int)
    for e in ev:
        if e.get("ph") == "X" and "dur" in e:
            pid_name = e.get("pid")
            name = e.get("name", "")
            args = e.get("args") or {}
            # keep XLA op events (they carry 'run_id'/'hlo' style args or land
            # on TensorCore tracks); filter out python/host bookkeeping
            if args.get("device_type") or "hlo_category" in args or True:
                dur[name] += e["dur"]
                cnt[name] += 1
    top = sorted(dur.items(), key=lambda kv: -kv[1])[:40]
    total = sum(dur.values())
    for name, d in top:
        print(f"{d/4/1000.0:9.3f} ms/iter x{cnt[name]:4d}  {name[:110]}")


if __name__ == "__main__":
    sys.exit(main())
