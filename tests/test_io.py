"""IO parsers: native C++ vs NumPy cross-checks + semantics tests."""

import numpy as np
import pytest

from real_tpu.io import fasta, native_io, reads as reads_io
from real_tpu.tools import simulate


def _same_readset(a, b):
    assert a.ids == b.ids
    assert (a.lengths == b.lengths).all()
    assert (a.codes_flat == b.codes_flat).all()
    assert (a.offsets == b.offsets).all()
    if a.quals_flat is None:
        assert b.quals_flat is None
    else:
        assert (a.quals_flat == b.quals_flat).all()
        assert a.quality_offset == b.quality_offset


def test_fasta_reads_native_vs_numpy(tmp_path):
    text = (">r1 with spaces\nACGT\nACGT\n"
            ">r2\nNNACGTacgt\n"          # lowercase -> N
            ">r3\n\n"                     # empty read
            ">r4\nTTTT")                  # no trailing newline
    buf = np.frombuffer(text.encode(), np.uint8)
    a = reads_io.parse_fasta_reads_bytes(buf)
    b = native_io.parse_fasta_reads_native(buf)
    if b is None:
        pytest.skip("native lib unavailable")
    _same_readset(a, b)
    assert a.ids == ["r1 with spaces", "r2", "r3", "r4"]
    assert a.lengths.tolist() == [8, 10, 0, 4]
    # lowercase maps to N (code 4)
    assert a.codes(1).tolist() == [4, 4, 0, 1, 2, 3, 4, 4, 4, 4]


def test_fastq_native_vs_numpy():
    # '5' (53) <= 54 is decisive for Sanger (FastQReader.hpp:229-236)
    text = ("@q1 desc\nACGTACGT\n+\n5IIIIIII\n"
            "@q2\nNNNNACGT\n+anything\nIIIIHHHH\n")
    buf = np.frombuffer(text.encode(), np.uint8)
    a = reads_io.parse_fastq_bytes(buf)
    b = native_io.parse_fastq_native(buf)
    if b is None:
        pytest.skip("native lib unavailable")
    _same_readset(a, b)
    assert a.quality_offset == 33
    assert a.quals(0).tolist() == [ord("5") - 33] + [ord("I") - 33] * 7


def test_genome_native_vs_numpy(tmp_path):
    text = simulate.random_genome(5000, seed=4, n_prob=0.01,
                                  num_fragments=3)
    # inject lowercase + gaps that must be dropped
    text = text.replace("ACGT", "acgt", 3)
    buf = np.frombuffer(text.encode(), np.uint8)
    codes_a, ranges_a = fasta.parse_genome_bytes(buf)
    res = native_io.parse_genome_native(buf)
    if res is None:
        pytest.skip("native lib unavailable")
    codes_b, ranges_b = res
    assert (codes_a == codes_b).all()
    assert ranges_a == ranges_b


def test_random_roundtrip_fasta(tmp_path):
    rng = np.random.default_rng(5)
    lens = rng.integers(20, 150, 50)
    recs = []
    for i, L in enumerate(lens):
        seq = "".join("ACGTN"[c] for c in rng.integers(0, 5, L))
        recs.append(f">read{i} x={i}\n{seq}")
    buf = np.frombuffer(("\n".join(recs) + "\n").encode(), np.uint8)
    a = reads_io.parse_fasta_reads_bytes(buf)
    b = native_io.parse_fasta_reads_native(buf)
    if b is not None:
        _same_readset(a, b)
    assert a.num_reads == 50
    assert (a.lengths == lens).all()


def test_stdin_flag_sniff():
    assert reads_io._first_nonspace(
        np.frombuffer(b"\n\n  @x", np.uint8)) == ord("@")


def test_native_formatter_vs_numpy(tmp_path):
    """format_records: native C++ path is byte-identical to the NumPy
    path across scores on/off, strands, N codes, multi-fragment texts."""
    import real_tpu.native as native
    from real_tpu.cli import output as out_mod
    from real_tpu.config import RealConfig
    from real_tpu.engine import driver

    if native.get_lib() is None:
        pytest.skip("native lib unavailable")
    g = tmp_path / "g.fa"
    g.write_text(simulate.random_genome(5000, seed=7, num_fragments=3))
    codes, _ = fasta.parse_genome(str(g))
    rds = simulate.generate_reads(codes, 300, 60, 0.05, False, seed=8)
    rp = tmp_path / "r.fa"
    simulate.write_reads(rds, str(rp), False)
    rs = reads_io.parse_reads(str(rp))
    cfg = RealConfig(textfilename=str(g), patternfilename=str(rp),
                     outputfilename="-")
    texts = driver.load_texts(cfg)

    rng = np.random.default_rng(0)
    n = 500
    pids = rng.integers(0, rs.num_reads, n)
    inv = rng.integers(0, 2, n).astype(bool)
    fileid = np.zeros(n, np.int32)
    frag = rng.integers(0, texts[0].packed.num_fragments, n).astype(np.int32)
    fo = np.array([off for _, off in texts[0].packed.ranges], np.int64)
    pos = (fo[frag] + rng.integers(0, 100, n)).astype(np.int32)
    errs = rng.integers(0, 6, n).astype(np.int32)
    score = rng.normal(50, 30, n).astype(np.float32)

    for scores in (True, False):
        nat = out_mod._format_records_native(
            rs, pids, inv, fileid, frag, pos, errs, score, texts, scores)
        assert nat is not None
        saved, native._lib = native._lib, None
        try:
            ref = out_mod._format_records(
                rs, pids, inv, fileid, frag, pos, errs, score, texts,
                scores)
        finally:
            native._lib = saved
        assert nat == ref
