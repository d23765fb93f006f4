"""Big-genome byte-identity regression guard (round-3 verdict weak #5).

The fast A/B tests cap at 30 kb genomes; the perf work that targets
big-genome configs (adaptive bucket widths, phase-major build, shard
planning) only changes behavior ABOVE those sizes. This test pins
byte-identical matchUnique output against the compiled reference at
10 Mbp / 20k reads — big enough to exercise multi-million-window builds
and (via -shards) the multi-pass merge — and runs on the CPU backend in
CI-ish time. Marked slow so it can be deselected with -m 'not slow'.
"""

import os
import subprocess

import numpy as np
import pytest

from tests import ab_util

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def inputs(tmp_path_factory):
    from benchmarks.gendata import write_random_genome, write_reads_fast
    from real_tpu.io import fasta
    d = tmp_path_factory.mktemp("scale_parity")
    g = str(d / "genome.fa")
    r = str(d / "reads.fa")
    write_random_genome(g, 10_000_000, seed=777, num_fragments=3)
    codes, _ = fasta.parse_genome(g)
    write_reads_fast(r, codes, 20_000, 80, 0.02, False, seed=778)
    return g, r


def test_10mbp_byte_identity(ref_real, inputs, tmp_path):
    g, r = inputs
    refout = str(tmp_path / "ref.out")
    subprocess.run(
        [ref_real, "-t", g, "-p", r, "-o", refout, "-T", "2"],
        check=True, capture_output=True)
    ours = ab_util.run_ours(g, r, scores=True)
    assert ours == open(refout).read()


def test_10mbp_byte_identity_sharded(ref_real, inputs, tmp_path):
    """Same inputs through 3 forced index shards (sequential multi-pass
    driver): the cross-pass best-hit merge must not change a byte at
    scale. use_mesh=False: the 8-virtual-device CPU mesh's all_gather
    rendezvous (40 s XLA timeout) cannot survive 5M-window per-device
    sorts on a 2-core host — the mesh path is exercised by the 30 kb
    tests and the multichip dryrun instead."""
    g, r = inputs
    refout = str(tmp_path / "ref.out")
    subprocess.run(
        [ref_real, "-t", g, "-p", r, "-o", refout, "-T", "2"],
        check=True, capture_output=True)
    ours = ab_util.run_ours(g, r, scores=True, index_shards=3,
                            use_mesh=False)
    assert ours == open(refout).read()


@pytest.fixture(scope="module")
def repeat_inputs(tmp_path_factory):
    """1.2 Mbp low-complexity genome: random background with embedded
    tandem-repeat arrays (120 bp unit x 60 copies, 24 arrays — the
    repeat structure the chr21-style random benchmarks cannot produce).
    Reads sampled from repeat arrays hit dozens of equal loci, driving
    candidate-cap overflow and the rerun ladder for real (round-3
    verdict weak #4/#7)."""
    rng = np.random.default_rng(4242)
    base = "ACGT"
    n = 1_200_000
    g = np.array(list(rng.integers(0, 4, n)), dtype=np.int8)
    # 24 arrays x 30 copies of a 120 bp unit; arrays 0/3/6/9 share one
    # unit (up to ~120 equal loci -> two ladder steps), the rest are
    # distinct (~30 loci -> one). Deeper multiplicities are covered by
    # the skewed-bucket adversarial test; at 960 shared copies this
    # fixture drove the ladder to depth 3, whose big-cap bisect variants
    # take minutes to compile on the CPU test backend.
    unit = rng.integers(0, 4, 120)
    for a in range(24):
        start = 20_000 + a * 45_000
        for c in range(30):
            s = start + c * 120
            g[s:s + 120] = unit if a % 3 == 0 and a < 12                 else (unit + a) % 4
    seq = "".join(base[int(b)] for b in g)
    d = tmp_path_factory.mktemp("repeat_rich")
    gp = str(d / "genome.fa")
    with open(gp, "w") as f:
        f.write(">rep0\n")
        for i in range(0, n, 60):
            f.write(seq[i:i + 60] + "\n")
    # half the reads from repeat arrays, half from background
    rp = str(d / "reads.fa")
    reads = []
    for i in range(600):
        if i % 2:
            a = int(rng.integers(0, 24))
            pos = 20_000 + a * 45_000 + int(rng.integers(0, 30 * 120 - 80))
        else:
            pos = int(rng.integers(0, n - 80))
        reads.append((f"rr{i}", seq[pos:pos + 80]))
    with open(rp, "w") as f:
        for nm, s in reads:
            f.write(f">{nm}\n{s}\n")
    return gp, rp


def test_repeat_rich_unique_byte_identity(ref_real, repeat_inputs, tmp_path,
                                          capsys):
    """matchUnique byte-identity on the tandem-repeat genome: repeat
    reads overflow the candidate caps and must come back exact through
    the escalation/rerun ladder."""
    g, r = repeat_inputs
    refout = str(tmp_path / "ref.out")
    subprocess.run([ref_real, "-t", g, "-p", r, "-o", refout, "-T", "2"],
                   check=True, capture_output=True)
    ours = ab_util.run_ours(g, r, scores=True, use_mesh=False)
    err = capsys.readouterr().err
    assert ours == open(refout).read()
    # the interesting case actually happened: some reads escalated
    assert "rerunning" in err, "expected cap overflow on repeat reads"


def test_repeat_rich_matchall_superset(ref_real, repeat_inputs, tmp_path):
    """matchAll on the repeat genome: every reference record present
    (ours may include the trailing records the reference's unflushed
    16KB buffer drops)."""
    g, r = repeat_inputs
    refout = str(tmp_path / "ref.out")
    subprocess.run([ref_real, "-t", g, "-p", r, "-o", refout, "-T", "2",
                    "-u", "0"], check=True, capture_output=True)
    ours = ab_util.run_ours(g, r, scores=True, unique=False,
                            use_mesh=False)
    ref_set = ab_util.as_record_set(open(refout).read())
    our_set = ab_util.as_record_set(ours)
    assert set(ref_set) <= set(our_set)


def test_window_extraction_beyond_2pow30():
    """Window extraction at base positions past 2^30: the old index math
    doubled the position in int32 (pos << 1) and silently corrupted
    every window beyond base 1.07G — config 5's >2 Gbp split texts hit
    this as the first-ever parity failure at that scale."""
    import jax.numpy as jnp
    from real_tpu.engine.matchstep import _extract_windows
    from real_tpu.index.hostbuild import _extract_bases16_np
    from real_tpu.text.packed import extract_bases16

    pos0 = (1 << 30) + 37
    nwords = (pos0 >> 4) + 8
    words = np.zeros(nwords, np.uint32)
    rng = np.random.default_rng(3)
    words[-8:] = rng.integers(0, 1 << 32, 8, dtype=np.uint32)
    pos = np.array([pos0, pos0 + 5, (1 << 30) - 3], dtype=np.int32)

    want = _extract_bases16_np(words, pos.astype(np.int64))
    got = np.asarray(extract_bases16(jnp.asarray(words), jnp.asarray(pos)))
    assert (got == want).all()

    got_w = _extract_windows(jnp.asarray(words), jnp.asarray(pos), 2)
    want_w = [_extract_bases16_np(words, pos.astype(np.int64) + 16 * i)
              for i in range(2)]
    for g, w in zip(got_w, want_w):
        assert (np.asarray(g) == w).all()
