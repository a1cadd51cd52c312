"""Sketch store: checkpoint/resume semantics (SURVEY.md §5 — sketches are
the natural checkpoint artifact; the reference has none)."""
import numpy as np

from spaced_kmer_sketching_tpu.config import SketchConfig
from spaced_kmer_sketching_tpu.models.fracminhash import FracMinHashSketcher
from spaced_kmer_sketching_tpu.store import SketchStore, completed_pairs_in_csv

from test_driver import write_fasta
from oracle import random_genome


def test_store_roundtrip_and_resume(tmp_path):
    rng = np.random.default_rng(2)
    paths = [write_fasta(tmp_path / f"g{i}.fa", [random_genome(rng, 1200)])
             for i in range(3)]
    cfg = SketchConfig(window=12, k=8, scale=5)
    sk = FracMinHashSketcher(cfg)
    store = SketchStore(str(tmp_path / "store"))

    first = store.sketch_files_resumable(sk, paths)
    assert all(s.count > 0 for s in first)

    # second run: everything cached; results identical
    calls = []
    orig = sk.sketch_file
    sk.sketch_file = lambda p: (calls.append(p), orig(p))[1]
    second = store.sketch_files_resumable(sk, paths)
    assert calls == []
    for a, b in zip(first, second):
        assert a.count == b.count
        np.testing.assert_array_equal(a.keys, b.keys)

    # different mask seed -> distinct cache key -> recompute
    cfg2 = SketchConfig(window=12, k=8, scale=5, mask_seed=7)
    sk2 = FracMinHashSketcher(cfg2)
    third = store.sketch_files_resumable(sk2, paths)
    assert len(third) == 3


def test_completed_pairs(tmp_path):
    p = tmp_path / "r.csv"
    p.write_text("File 1,File 2,Estimated Value,Window Size,Mask\n"
                 "a,b,0.9,10,0000\n"
                 "b,a,0.8,10,0000\n"
                 "b,a,0.8,10,0000\n"       # duplicate row (same path twice)
                 "a,b,0.7,10,0011\n")      # same window, different mask
    done = completed_pairs_in_csv(str(p))
    assert done[("a", "b", "10", "0000")] == 1
    assert done[("b", "a", "10", "0000")] == 2        # multiplicity kept
    assert done[("a", "b", "10", "0011")] == 1        # mask disambiguates
    assert done[("a", "b", "12", "0000")] == 0
    assert len(completed_pairs_in_csv(str(tmp_path / "missing.csv"))) == 0
