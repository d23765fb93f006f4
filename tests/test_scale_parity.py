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
