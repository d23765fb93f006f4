"""Multi-host code path (SURVEY §5.8 / VERDICT #9).

Spawns REAL separate processes connected through a jax.distributed
coordinator (CPU backend, 4 virtual devices per process), each matching
its read slice on its local (dp, shard) mesh; asserts the concatenated
per-rank outputs equal the single-process run byte-for-byte. Also covers
the host-slice and mesh-shape planning helpers standalone.
"""

import io
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from real_tpu.parallel import multihost

HERE = os.path.dirname(os.path.abspath(__file__))


def test_host_read_slice_partitions():
    for n in (0, 1, 15, 16, 100, 1001):
        for procs in (1, 2, 3, 4):
            got = []
            for p in range(procs):
                lo, hi = multihost.host_read_slice(
                    n, multihost.HostTopology(p, procs))
                assert 0 <= lo <= hi <= n
                if p < procs - 1 and hi < n:
                    assert (hi - lo) % 16 == 0
                got.extend(range(lo, hi))
            assert got == list(range(n))


def test_dp_shard_axes_keeps_shard_local():
    n_dp, n_shard = multihost.dp_shard_axes(
        n_local_devices=4, n_processes=2, total_index_shards=2)
    assert n_shard == 2 and n_dp == 4      # shard axis inside one host
    n_dp, n_shard = multihost.dp_shard_axes(4, 2, 1)
    assert n_shard == 1 and n_dp == 8


@pytest.mark.parametrize("fastq", [False, True])
def test_parse_reads_sliced_concat_equals_full(tmp_path, fastq):
    """Per-host sliced parsing: rank slices concatenate to the full parse
    (ids, codes, lengths, qualities, quality offset)."""
    from real_tpu.io import fasta, reads as reads_io
    from real_tpu.tools import simulate

    g = str(tmp_path / "g.fa")
    r = str(tmp_path / ("r.fq" if fastq else "r.fa"))
    with open(g, "w") as f:
        f.write(simulate.random_genome(8000, seed=31))
    codes, _ = fasta.parse_genome(g)
    simulate.write_reads(
        simulate.generate_reads(codes, 101, 50, 0.02, fastq, seed=32), r,
        fastq)

    full = reads_io.parse_reads(r)
    for nranks in (1, 2, 3):
        parts = [reads_io.parse_reads_sliced(r, p, nranks)
                 for p in range(nranks)]
        assert parts[0][2] == full.num_reads
        got_ids = [i for rs, _, _ in parts for i in rs.ids]
        assert got_ids == list(full.ids)
        np.testing.assert_array_equal(
            np.concatenate([rs.lengths for rs, _, _ in parts]),
            full.lengths)
        np.testing.assert_array_equal(
            np.concatenate([rs.codes_flat for rs, _, _ in parts]),
            full.codes_flat)
        if fastq:
            np.testing.assert_array_equal(
                np.concatenate([rs.quals_flat for rs, _, _ in parts]),
                full.quals_flat)
            assert all(rs.quality_offset == full.quality_offset
                       for rs, _, _ in parts)


def test_two_process_output_equals_single(tmp_path):
    from real_tpu.cli.output import write_unique
    from real_tpu.config import RealConfig
    from real_tpu.engine import driver
    from real_tpu.io import fasta, reads as reads_io
    from real_tpu.tools import simulate

    d = str(tmp_path)
    g, r = os.path.join(d, "g.fa"), os.path.join(d, "r.fa")
    with open(g, "w") as f:
        f.write(simulate.random_genome(12000, seed=21, num_fragments=2))
    codes, _ = fasta.parse_genome(g)
    simulate.write_reads(
        simulate.generate_reads(codes, 192, 70, 0.02, False, seed=22), r,
        False)

    # single-process truth on the same mesh shape
    cfg = RealConfig(textfilename=g, patternfilename=r, outputfilename="-",
                     batch_size=64, index_shards=2, use_mesh=True)
    rs = reads_io.parse_reads(r)
    texts = driver.load_texts(cfg)
    res = driver.run_match_unique(cfg, rs, texts)
    buf = io.StringIO()
    write_unique(buf, rs, res, texts, cfg.scores)
    single = buf.getvalue()

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    procs = [subprocess.Popen(
        [sys.executable, os.path.join(HERE, "multihost_worker.py"),
         coord, "2", str(p), d],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE)
        for p in range(2)]
    outs = [p.communicate(timeout=540) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, se.decode()[-2000:]

    merged = "".join(open(os.path.join(d, f"out_{p}.txt")).read()
                     for p in range(2))
    assert merged == single


def test_two_process_build_exchange_equals_single(tmp_path):
    """VERDICT r4 missing #3: the de-replicated build (per-rank shard
    ownership + exchange) must reproduce the single-process output
    byte-for-byte while each rank builds only its owned shards."""
    from real_tpu.cli.output import write_unique
    from real_tpu.config import RealConfig
    from real_tpu.engine import driver
    from real_tpu.io import fasta, reads as reads_io
    from real_tpu.tools import simulate

    d = str(tmp_path)
    g, r = os.path.join(d, "g.fa"), os.path.join(d, "r.fa")
    with open(g, "w") as f:
        f.write(simulate.random_genome(12000, seed=41, num_fragments=2))
    codes, _ = fasta.parse_genome(g)
    simulate.write_reads(
        simulate.generate_reads(codes, 160, 70, 0.02, False, seed=42), r,
        False)

    cfg = RealConfig(textfilename=g, patternfilename=r, outputfilename="-",
                     batch_size=64, index_shards=3, use_mesh=False)
    rs = reads_io.parse_reads(r)
    texts = driver.load_texts(cfg)
    res = driver.run_match_unique(cfg, rs, texts)
    buf = io.StringIO()
    write_unique(buf, rs, res, texts, cfg.scores)
    single = buf.getvalue()

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    procs = [subprocess.Popen(
        [sys.executable, os.path.join(HERE, "multihost_worker.py"),
         coord, "2", str(p), d, "exchange"],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE)
        for p in range(2)]
    outs = [p.communicate(timeout=540) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, se.decode()[-2000:]

    # both ranks must have published only their OWNED shards
    exch = os.path.join(d, "exchange")
    done = sorted(f for f in os.listdir(exch) if f.endswith(".done"))
    assert len(done) == 3

    merged = "".join(open(os.path.join(d, f"out_{p}.txt")).read()
                     for p in range(2))
    assert merged == single
