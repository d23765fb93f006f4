"""End-to-end A/B tests against the compiled reference binary.

matchUnique output is deterministic in the reference (single ordered final
pass) => compare byte-for-byte. matchAll output is thread-interleaved =>
compare as sorted record sets (SURVEY.md §3.2)."""

import pytest

from tests import ab_util


def test_unique_noscores_fasta(ref_real, tmp_path):
    genome, reads = ab_util.make_inputs(tmp_path, n=20000, numpat=300,
                                        patlen=100, errprob=0.02)
    ref = ab_util.run_reference(
        ref_real, genome, reads, str(tmp_path / "ref.out"),
        ab_util.ref_flags(scores=False))
    ours = ab_util.run_ours(genome, reads, scores=False)
    assert ours == ref


def test_unique_scores_fasta(ref_real, tmp_path):
    genome, reads = ab_util.make_inputs(tmp_path, n=20000, numpat=300,
                                        patlen=100, errprob=0.02, seed=7)
    ref = ab_util.run_reference(
        ref_real, genome, reads, str(tmp_path / "ref.out"),
        ab_util.ref_flags(scores=True))
    ours = ab_util.run_ours(genome, reads, scores=True)
    assert ours == ref


def test_unique_scores_fastq(ref_real, tmp_path):
    genome, reads = ab_util.make_inputs(tmp_path, n=20000, numpat=300,
                                        patlen=100, errprob=0.02, seed=3,
                                        fastq=True)
    ref = ab_util.run_reference(
        ref_real, genome, reads, str(tmp_path / "ref.out"),
        ab_util.ref_flags(scores=True))
    ours = ab_util.run_ours(genome, reads, scores=True)
    assert ours == ref


def test_unique_seedlen_reads(ref_real, tmp_path):
    """patl == seedl: empty rest (BASELINE config 1 shape)."""
    genome, reads = ab_util.make_inputs(tmp_path, n=20000, numpat=300,
                                        patlen=32, errprob=0.03, seed=11)
    ref = ab_util.run_reference(
        ref_real, genome, reads, str(tmp_path / "ref.out"),
        ab_util.ref_flags(scores=False, seedkmax=2, totalkmax=2))
    ours = ab_util.run_ours(genome, reads, scores=False, seedkmax=2,
                            totalkmax=2)
    assert ours == ref


def test_unique_with_n_in_genome(ref_real, tmp_path):
    genome, reads = ab_util.make_inputs(tmp_path, n=20000, numpat=200,
                                        patlen=80, errprob=0.02, seed=5,
                                        n_prob=0.002)
    ref = ab_util.run_reference(
        ref_real, genome, reads, str(tmp_path / "ref.out"),
        ab_util.ref_flags(scores=True))
    ours = ab_util.run_ours(genome, reads, scores=True)
    assert ours == ref


def test_unique_multifragment(ref_real, tmp_path):
    genome, reads = ab_util.make_inputs(tmp_path, n=30000, numpat=200,
                                        patlen=75, errprob=0.02, seed=9,
                                        num_fragments=5)
    ref = ab_util.run_reference(
        ref_real, genome, reads, str(tmp_path / "ref.out"),
        ab_util.ref_flags(scores=True))
    ours = ab_util.run_ours(genome, reads, scores=True)
    assert ours == ref


@pytest.mark.parametrize("scores", [False, True])
@pytest.mark.parametrize("shards,use_mesh", [(4, True), (4, False),
                                             (1, False)])
def test_unique_driver_paths(ref_real, tmp_path, scores, shards, use_mesh):
    """The driver's mesh path (dp x shard over the 8 virtual devices) and
    the forced-sequential path must BOTH be byte-identical to the
    reference, including with a real shard axis (index_shards=4)."""
    genome, reads = ab_util.make_inputs(tmp_path, n=24000, numpat=250,
                                        patlen=90, errprob=0.02, seed=23)
    ref = ab_util.run_reference(
        ref_real, genome, reads, str(tmp_path / "ref.out"),
        ab_util.ref_flags(scores=scores))
    ours = ab_util.run_ours(genome, reads, scores=scores,
                            index_shards=shards, use_mesh=use_mesh)
    assert ours == ref


@pytest.mark.parametrize("seedl", [48, 64])
@pytest.mark.parametrize("use_mesh", [False, True])
def test_unique_wide_seedl(ref_real, tmp_path, seedl, use_mesh):
    """seedl > 32: 64-bit pair signatures as (hi, lo) uint32 planes — the
    reference's u_int64_t dispatch (real.cpp:217-221). Byte-identical on
    both the sequential and the mesh driver path."""
    genome, reads = ab_util.make_inputs(tmp_path, n=24000, numpat=250,
                                        patlen=100, errprob=0.02,
                                        seed=40 + seedl)
    ref = ab_util.run_reference(
        ref_real, genome, reads, str(tmp_path / "ref.out"),
        ab_util.ref_flags(scores=True, seedl=seedl))
    ours = ab_util.run_ours(genome, reads, scores=True, seedl=seedl,
                            use_mesh=use_mesh,
                            index_shards=4 if use_mesh else 1)
    assert ours == ref


def test_wide_seedl_host_equals_device_build(tmp_path):
    """Host (NumPy) and device (lax.sort) wide index builds are equal."""
    import numpy as np
    from real_tpu.index.build import build_index
    from real_tpu.index.hostbuild import build_index_host
    from real_tpu.io import fasta
    from real_tpu.text.packed import build_packed_text
    from real_tpu.tools import simulate

    g = str(tmp_path / "g.fa")
    with open(g, "w") as f:
        f.write(simulate.random_genome(9000, seed=51, n_prob=0.001))
    codes, ranges = fasta.parse_genome(g)
    text = build_packed_text(codes, ranges)
    for seedl in (48, 64):
        a = build_index(text, seedl)
        b = build_index_host(text, seedl)
        assert (np.asarray(a.sig_hi) == np.asarray(b.sig_hi)).all()
        assert (np.asarray(a.sig) == np.asarray(b.sig)).all()
        assert (np.asarray(a.pos) == np.asarray(b.pos)).all()
        assert (np.asarray(a.bb) == np.asarray(b.bb)).all()


def test_matchall_driver_sharded(ref_real, tmp_path):
    """matchAll through the mesh driver with a shard axis: same record
    set as the single-shard sequential run, and superset of the
    reference."""
    genome, reads = ab_util.make_inputs(tmp_path, n=24000, numpat=150,
                                        patlen=60, errprob=0.02, seed=29)
    a = ab_util.run_ours(genome, reads, unique=False, index_shards=4,
                         use_mesh=True)
    b = ab_util.run_ours(genome, reads, unique=False, index_shards=1,
                         use_mesh=False)
    assert ab_util.as_record_set(a) == ab_util.as_record_set(b)
    ref = ab_util.run_reference(
        ref_real, genome, reads, str(tmp_path / "ref.out"),
        ab_util.ref_flags(unique=False))
    assert set(ab_util.as_record_set(ref)) <= set(ab_util.as_record_set(a))


# NOTE: the reference's matchAll output path buffers records in a 16KB
# thread-local ostringstream that is only written once it EXCEEDS 16384
# bytes and is never flushed at the end
# (matchAllImplementation.cpp:512-517) — trailing records are silently
# dropped (a run with < 16KB of total output produces an EMPTY file).
# So matchAll A/B asserts: reference records ⊆ ours, and cross-checks our
# matchAll against matchUnique (which is bit-identical to the reference).


def _matchall_ab(ref_real, tmp_path, scores, seed):
    genome, reads = ab_util.make_inputs(tmp_path, n=20000, numpat=200,
                                        patlen=60, errprob=0.02, seed=seed)
    ref = ab_util.run_reference(
        ref_real, genome, reads, str(tmp_path / "ref.out"),
        ab_util.ref_flags(unique=False, scores=scores))
    ours = ab_util.run_ours(genome, reads, unique=False, scores=scores)
    ref_set = set(ab_util.as_record_set(ref))
    our_set = set(ab_util.as_record_set(ours))
    missing = ref_set - our_set
    assert not missing, sorted(missing)[:5]

    # cross-check: every matchUnique hit must appear among our all-hits
    uniq = ab_util.run_ours(genome, reads, unique=True, scores=scores)
    uniq_set = set(ab_util.as_record_set(uniq))
    assert uniq_set <= our_set


def test_skewed_bucket_adversarial(ref_real, tmp_path):
    """A genome engineered so one 22-bit bucket holds thousands of index
    entries while each equal range is tiny: 32-base blocks all sharing an
    11-base prefix (= the s0 bucket key, getSampleBits.hpp:22-25). The
    static bisection-depth heuristic (driver._bsearch_steps_static)
    undershoots this bucket by far; the unconverged bisection must return
    conservative bounds and escalate (matchstep.find_survivors) rather
    than silently drop the true hits — the round-2 advisor's high-severity
    finding. Byte-identical through BOTH driver paths."""
    import numpy as np
    rng = np.random.default_rng(77)
    nblk = 3000
    prefix = "ACGTACGTACG"          # 11 bases = 22 bucket bits of list s0
    base = "ACGT"
    blocks = ["".join(base[b] for b in rng.integers(0, 4, 21))
              for _ in range(nblk)]
    genome = "".join(prefix + b for b in blocks)
    gpath = tmp_path / "g.fa"
    gpath.write_text(">frag0\n" + "\n".join(
        genome[i:i + 60] for i in range(0, len(genome), 60)) + "\n")
    # 64bp reads at block starts: every read's s0 probe lands in the
    # packed bucket, but its equal range holds only a handful of entries
    reads = []
    for i in range(0, nblk - 2, 7):
        pos = i * 32
        reads.append((f"r{i}", genome[pos:pos + 64]))
    rpath = tmp_path / "r.fa"
    rpath.write_text("".join(f">{n}\n{s}\n" for n, s in reads))
    ref = ab_util.run_reference(ref_real, str(gpath), str(rpath),
                                str(tmp_path / "ref.out"),
                                ab_util.ref_flags(scores=False))
    assert ref.strip(), "adversarial input produced no reference hits"
    for use_mesh, shards in ((False, 1), (True, 4)):
        ours = ab_util.run_ours(str(gpath), str(rpath), scores=False,
                                use_mesh=use_mesh, index_shards=shards)
        assert ours == ref, f"mismatch (use_mesh={use_mesh})"


def test_text_autosplit_byte_identical(ref_real, tmp_path):
    """Oversized-text auto-split (driver.split_oversized): forcing a tiny
    split limit makes load_texts break one multi-fragment file into
    several sub-texts; output must stay byte-identical to the reference
    seeing the whole file (the config-5 / GRCh38 >2^31-base shape,
    exercised at small scale — positions are fragment-relative, so the
    grouping is unobservable). Covers hits in every sub-text."""
    genome, reads = ab_util.make_inputs(tmp_path, n=30000, numpat=250,
                                        patlen=75, errprob=0.02, seed=61,
                                        num_fragments=7)
    ref = ab_util.run_reference(
        ref_real, genome, reads, str(tmp_path / "ref.out"),
        ab_util.ref_flags(scores=True))
    # ~30000/7 ≈ 4300 bases per fragment; limit 10k → 3+ sub-texts
    ours = ab_util.run_ours(genome, reads, scores=True, split_limit=10000)
    assert ours == ref
    # also through the mesh/sharded path
    ours_mesh = ab_util.run_ours(genome, reads, scores=True,
                                 split_limit=10000, use_mesh=True,
                                 index_shards=2)
    assert ours_mesh == ref


def test_matchall_noscores(ref_real, tmp_path):
    _matchall_ab(ref_real, tmp_path, scores=False, seed=13)


def test_matchall_scores(ref_real, tmp_path):
    _matchall_ab(ref_real, tmp_path, scores=True, seed=17)


def test_unique_reads_containing_n(ref_real, tmp_path):
    """Reads with N bases are skipped by the reference
    (matchUniqueImplementation.cpp:385-394) — our valid mask must match
    byte-for-byte."""
    import numpy as np
    genome, reads = ab_util.make_inputs(tmp_path, n=20000, numpat=300,
                                        patlen=80, errprob=0.02, seed=17)
    # inject N's into ~1/3 of the reads (deterministic)
    lines = open(reads).read().splitlines()
    rng = np.random.default_rng(18)
    for i in range(1, len(lines), 2):       # sequence lines
        if (i // 2) % 3 == 0:
            s = list(lines[i])
            s[int(rng.integers(0, len(s)))] = "N"
            lines[i] = "".join(s)
    with open(reads, "w") as f:
        f.write("\n".join(lines) + "\n")
    ref = ab_util.run_reference(
        ref_real, genome, reads, str(tmp_path / "ref.out"),
        ab_util.ref_flags(scores=True))
    ours = ab_util.run_ours(genome, reads, scores=True)
    assert ours == ref


def test_directory_of_fa_texts(ref_real, tmp_path):
    """-t <dir>: recursive *.fa enumeration (getFileList.cpp:136-174)."""
    from real_tpu.io import fasta
    from real_tpu.tools import simulate
    d = tmp_path / "texts"
    d.mkdir()
    (d / "a.fa").write_text(simulate.random_genome(12000, seed=31,
                                                   name="ga"))
    (d / "b.fa").write_text(simulate.random_genome(9000, seed=32,
                                                   name="gb"))
    codes, _ = fasta.parse_genome(str(d / "a.fa"))
    rds = simulate.generate_reads(codes, 150, 70, 0.02, False, seed=33)
    reads = str(tmp_path / "r.fa")
    simulate.write_reads(rds, reads, False)
    ref = ab_util.run_reference(
        ref_real, str(d), reads, str(tmp_path / "ref.out"),
        ab_util.ref_flags(scores=True))
    ours = ab_util.run_ours(str(d), reads, scores=True)
    assert ours == ref


def test_fastq_illumina_offset_autodetect(ref_real, tmp_path):
    """Quality chars >= 94 ('^') => Illumina offset 64 autodetect
    (FastQReader.hpp:221-239)."""
    genome, reads = ab_util.make_inputs(tmp_path, n=20000, numpat=200,
                                        patlen=60, errprob=0.02, seed=23,
                                        fastq=True)
    # rewrite qualities to Illumina-offset chars (all >= 94: decisive)
    lines = open(reads).read().splitlines()
    for i in range(3, len(lines), 4):
        # D (Q=35 Sanger) -> 'c' (99-64=35), * (Q=9) -> 'I' is Sanger...
        # use chars 64+q: q=35 -> 'c'(99), q=9 -> 'I'(73) is NOT >= 94;
        # keep it simple: high qualities only, all decisive
        lines[i] = "".join("h" if c == "D" else "`" for c in lines[i])
    with open(reads, "w") as f:
        f.write("\n".join(lines) + "\n")
    ref = ab_util.run_reference(
        ref_real, genome, reads, str(tmp_path / "ref.out"),
        ab_util.ref_flags(scores=True))
    ours = ab_util.run_ours(genome, reads, scores=True)
    assert ours == ref


def test_stdin_reads(ref_real, tmp_path, monkeypatch):
    """-p -: read patterns from stdin (RealOptions.cpp:418-426)."""
    import io as _io
    import subprocess
    genome, reads = ab_util.make_inputs(tmp_path, n=15000, numpat=150,
                                        patlen=64, errprob=0.02, seed=27)
    blob = open(reads, "rb").read()
    refout = str(tmp_path / "ref.out")
    subprocess.run([ref_real, "-t", genome, "-p", "-", "-o", refout,
                    "-T", "2", *ab_util.ref_flags(scores=True)],
                   input=blob, check=True, capture_output=True)
    ref = open(refout).read()

    class _Stdin:
        buffer = _io.BytesIO(blob)
    import sys as _sys
    monkeypatch.setattr(_sys, "stdin", _Stdin())
    ours = ab_util.run_ours(genome, "-", scores=True)
    assert ours == ref
