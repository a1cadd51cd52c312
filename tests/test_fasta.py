"""FASTA ingest semantics, incl. the reference's parser quirks
(src/fasta_processing.cpp:79-198)."""
import numpy as np
import pytest

from spaced_kmer_sketching_tpu.ingest.fasta import (PackedSeqs,
                                                    read_fasta,
                                                    records_from_fasta_text)
from spaced_kmer_sketching_tpu.utils import native


def write(tmp_path, text, name="x.fa"):
    p = tmp_path / name
    p.write_text(text)
    return str(p)


def runs(packed: PackedSeqs):
    out, pos = [], 0
    for n in packed.run_lens:
        out.append(list(packed.codes[pos:pos + int(n)]))
        pos += int(n)
    return out


def test_basic_encoding(tmp_path):
    p = write(tmp_path, ">r\nACGTacgt\n")
    pk = read_fasta(p, use_native=False)
    assert runs(pk) == [[0, 1, 2, 3, 0, 1, 2, 3]]


def test_non_acgt_splits_runs(tmp_path):
    p = write(tmp_path, ">r\nACGTNACGT\nACNNGT\n")
    pk = read_fasta(p, use_native=False)
    # lines concatenate first, then split at non-ACGT
    assert runs(pk) == [[0, 1, 2, 3], [0, 1, 2, 3, 0, 1], [2, 3]]


def test_space_line_discards_record(tmp_path):
    # quirk: a sequence line containing a space discards the current record
    # AND everything already accumulated for it (fasta_processing.cpp:114-118)
    p = write(tmp_path, ">r1\nACGT\nAC GT\nTTTT\n>r2\nGGGG\n")
    pk = read_fasta(p, use_native=False)
    assert runs(pk) == [[2, 2, 2, 2]]


def test_blank_line_flushes_but_keeps_name(tmp_path):
    # a blank line emits the current record; the name persists, so following
    # sequence becomes a second record under the same name
    p = write(tmp_path, ">r\nAAAA\n\nCCCC\n")
    pk = read_fasta(p, use_native=False)
    assert runs(pk) == [[0, 0, 0, 0], [1, 1, 1, 1]]


def test_sequence_before_header_ignored(tmp_path):
    p = write(tmp_path, "ACGT\n>r\nTTTT\n")
    pk = read_fasta(p, use_native=False)
    assert runs(pk) == [[3, 3, 3, 3]]


def test_crlf_becomes_run_split(tmp_path):
    # std::getline keeps '\r'; it is non-ACGT so it cuts runs at line ends
    p = tmp_path / "crlf.fa"
    p.write_bytes(b">r\r\nACGT\r\nACGT\r\n")
    pk = read_fasta(str(p), use_native=False)
    assert runs(pk) == [[0, 1, 2, 3], [0, 1, 2, 3]]


def test_missing_file():
    with pytest.raises(FileNotFoundError):
        read_fasta("/does/not/exist.fa", use_native=False)
    if native.available():
        with pytest.raises(FileNotFoundError):
            read_fasta("/does/not/exist.fa", use_native=True)


def test_multi_record(tmp_path):
    p = write(tmp_path, ">a\nAC\n>b\nGT\n")
    pk = read_fasta(p, use_native=False)
    assert runs(pk) == [[0, 1], [2, 3]]


def test_records_text_parser():
    recs = records_from_fasta_text(">a\nAC\nGT\n>b\nTT\n")
    assert recs == ["ACGT", "TT"]


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
def test_native_matches_python(tmp_path):
    cases = [
        ">r\nACGTacgt\n",
        ">r\nACGTNACGT\nACNNGT\n",
        ">r1\nACGT\nAC GT\nTTTT\n>r2\nGGGG\n",
        ">r\nAAAA\n\nCCCC\n",
        "ACGT\n>r\nTTTT\n",
        ">a\nAC\n>b\nGT\n",
        ">only-header\n",
        "",
        ">r\nACGT",  # no trailing newline
    ]
    for i, text in enumerate(cases):
        p = write(tmp_path, text, name=f"case{i}.fa")
        a = read_fasta(p, use_native=False)
        b = read_fasta(p, use_native=True)
        assert np.array_equal(a.codes, b.codes), text
        assert np.array_equal(a.run_lens, b.run_lens), text


def test_total_windows():
    pk = PackedSeqs(codes=np.zeros(10, np.uint8),
                    run_lens=np.array([7, 3], dtype=np.int64))
    assert pk.total_windows(5) == 3  # run of 3 too short
    assert pk.total_windows(3) == 5 + 1


def test_streaming_parser_matches_whole_file(tmp_path):
    """The two-pass streaming parser yields the same code/run stream as the
    whole-file parser across all record quirks and chunk boundaries."""
    from spaced_kmer_sketching_tpu.ingest.fasta import read_fasta
    from spaced_kmer_sketching_tpu.utils import native
    if not native.available():
        import pytest
        pytest.skip("native library unavailable")
    p = tmp_path / "quirks.fa"
    p.write_text(
        ">r1\nACGTACGTNNACGT\nacgt\n"      # lowercase + run split
        ">r2\nAC GT\nACGTACGT\n"           # space discards r2 entirely
        ">\nACGT\n"                        # bare '>': empty name, ignored
        ">r3\nACGTAC\n\nGTGT\n"            # blank-line flush: two strings
        ">r4 desc\nACG\r\nTTT\n"           # CRLF: \r splits the run
    )
    packed = read_fasta(str(p))
    want_codes = packed.codes
    want_lens = packed.run_lens.tolist()

    for chunk in (3, 7, 64, 4096):
        codes_all, lens, cur = [], [], 0
        prev_open = False
        for codes, run_ends, open_run in native.fasta_stream(str(p), chunk):
            b = [0] + run_ends.tolist() + [codes.size]
            segs = [b[i + 1] - b[i] for i in range(len(b) - 1)]
            if prev_open and lens:
                lens[-1] += segs[0]
                segs = segs[1:]
            lens.extend(s for s in segs)
            codes_all.append(codes)
            prev_open = open_run
        lens = [x for x in lens if x > 0]
        got_codes = np.concatenate(codes_all) if codes_all else np.empty(0)
        np.testing.assert_array_equal(got_codes, want_codes)
        assert lens == want_lens, (chunk, lens, want_lens)


def test_streaming_sketch_bitexact(tmp_path):
    """sketch_file_streaming == sketch_file across chunk-boundary windows,
    run splits, and multi-record files."""
    from spaced_kmer_sketching_tpu.config import SketchConfig
    from spaced_kmer_sketching_tpu.models.fracminhash import FracMinHashSketcher
    from spaced_kmer_sketching_tpu.utils import native
    if not native.available():
        import pytest
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(23)
    seq = "".join("ACGT"[c] for c in rng.integers(0, 4, 30000))
    seq = seq[:9000] + "NN" + seq[9000:]
    p = tmp_path / "g.fa"
    p.write_text(f">a\n{seq[:20000]}\n>b\n{seq[20000:]}\n")
    sk = FracMinHashSketcher(SketchConfig(window=20, k=16, scale=20))
    want = sk.sketch_file(str(p))
    # 12000 yields 3 segments: a non-power-of-two count exercises the
    # padded final merge stack
    for segment in (1 << 12, 12000, 1 << 14):
        got = sk.sketch_file_streaming(str(p), segment_nt=segment)
        assert got.count == want.count, segment
        np.testing.assert_array_equal(got.keys, want.keys)


def test_sketch_files_auto_streams_big_files(tmp_path, monkeypatch):
    """Files past _STREAM_THRESHOLD_BYTES route through the streaming
    pipeline inside sketch_files, with output order and content identical
    to the whole-file path (BASELINE config 5 driver integration)."""
    from spaced_kmer_sketching_tpu.config import SketchConfig
    from spaced_kmer_sketching_tpu.models.fracminhash import (
        FracMinHashSketcher)
    from spaced_kmer_sketching_tpu.utils import native
    if not native.available():
        import pytest
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(29)
    paths = []
    for i, n in enumerate((30000, 5000)):
        seq = "".join("ACGT"[c] for c in rng.integers(0, 4, n))
        p = tmp_path / f"g{i}.fa"
        p.write_text(f">g{i}\n{seq}\n")
        paths.append(str(p))
    sk = FracMinHashSketcher(SketchConfig(window=20, k=16, scale=20))
    want = sk.sketch_files(paths)
    monkeypatch.setattr(FracMinHashSketcher, "_STREAM_THRESHOLD_BYTES",
                        10000)              # only g0 streams
    got = sk.sketch_files(paths)
    for w, g in zip(want, got):
        assert g.count == w.count and g.name == w.name
        np.testing.assert_array_equal(g.keys, w.keys)


def test_per_record_info_logging(tmp_path, caplog):
    """With INFO enabled, each flushed record logs the reference's
    per-record line "Read <name> from file <f>"
    (fasta_processing.cpp:102-103,127-128) — including from read_fasta's
    default (native-preferred) entry, which routes through the Python
    parser when INFO is on."""
    import logging

    p = write(tmp_path, ">r1\nACGT\n>r2 desc\nGGGG\n\nTTTT\n")
    with caplog.at_level(logging.INFO,
                         logger="spaced_kmer_sketching_tpu.ingest.fasta"):
        pk = read_fasta(p)
    msgs = [r.getMessage() for r in caplog.records]
    # r1 flushes at the '>r2' header; r2 flushes at the blank line AND at
    # EOF (blank line keeps the name: two records under one name)
    assert msgs == [f"Read r1 from file {p}",
                    f"Read r2 desc from file {p}",
                    f"Read r2 desc from file {p}"]
    assert runs(pk) == [[0, 1, 2, 3], [2, 2, 2, 2], [3, 3, 3, 3]]

    # with INFO disabled (default), no records are logged and the parse
    # output is identical
    caplog.clear()
    with caplog.at_level(logging.WARNING,
                         logger="spaced_kmer_sketching_tpu.ingest.fasta"):
        pk2 = read_fasta(p)
    assert not caplog.records
    assert np.array_equal(pk.codes, pk2.codes)
    assert np.array_equal(pk.run_lens, pk2.run_lens)
