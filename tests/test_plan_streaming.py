"""Streaming (pass-minimizing) shard planner — VERDICT r4 missing #2.

When every index pass re-streams the whole read file (reads exceed the
resident HBM budget, BASELINE config 4), the driver serializes index
builds (peak 2.2x lists instead of the pipelined 4x) and widens the
bucket-table cap so the doubled shards stay bisection-free. These tests
pin the planner's decisions at the BASELINE shapes and the serial-path
byte-identity at test scale.
"""

import io
import os
import subprocess

import numpy as np
import pytest

from real_tpu.parallel import plan

HBM = 16 * 1024**3


def test_config4_two_serial_shards():
    # Drosophila scale: 140M windows, ~35 MB packed text reserved.
    # The pipelined plan needs 3 passes; serial build fits 2.
    p = plan.plan_index_shards_streaming(
        140_000_000, 0.75, reserved_bytes=35_000_000, hbm_bytes=HBM)
    assert p.shards == 2 and p.serial_build
    assert p.bucket_bits_cap == 26   # 70M windows/shard at occupancy ~1
    assert plan.plan_index_shards(
        140_000_000, 0.75, reserved_bytes=35_000_000, hbm_bytes=HBM) == 3


def test_small_genome_keeps_pipelined_plan():
    p = plan.plan_index_shards_streaming(
        46_700_000, 0.75, reserved_bytes=12_000_000, hbm_bytes=HBM)
    assert p.shards == 1 and not p.serial_build


def test_tiny_device_falls_back():
    # tiny budgets must yield a usable plan (the serial math must not
    # divide by a non-positive table residual); a single serial shard
    # that fits is acceptable — fewer passes is the whole point
    p = plan.plan_index_shards_streaming(
        1_000_000, 0.75, hbm_bytes=256 * 1024**2)
    assert p.shards >= 1
    if p.serial_build:
        budget = 0.75 * 256 * 1024**2
        per = -(-1_000_000 // p.shards)
        assert per * plan.BYTES_PER_WINDOW * plan.SERIAL_BUILD_FACTOR \
            <= budget


def test_serial_shard_memory_model():
    # the serial plan's own promise: lists x SERIAL_BUILD_FACTOR plus
    # one bucket table fit the budget for every planned shard size
    for windows in (140_000_000, 500_000_000, 2_070_000_000):
        p = plan.plan_index_shards_streaming(
            windows, 0.75, reserved_bytes=800_000_000, hbm_bytes=HBM)
        if not p.serial_build:
            continue
        per = -(-windows // p.shards)
        budget = 0.75 * HBM - 800_000_000
        table = 6 * ((1 << p.bucket_bits_cap) + 1) * 4
        assert per * plan.BYTES_PER_WINDOW * plan.SERIAL_BUILD_FACTOR \
            + table <= budget
        # occupancy stays on the bisection-free lane path
        assert per / float(1 << p.bucket_bits_cap) <= 2.0


@pytest.mark.slow
def test_streaming_serial_byte_identity(ref_real, tmp_path, monkeypatch):
    """Force the serial streaming path at test scale (shrunken virtual
    HBM + a 1-byte resident-read budget) and pin byte-identity against
    the reference."""
    from real_tpu.cli.output import write_unique
    from real_tpu.config import RealConfig
    from real_tpu.engine import driver
    from real_tpu.io import reads as reads_io
    from tests import ab_util

    g, r = ab_util.make_inputs(tmp_path, n=400_000, numpat=2000,
                               patlen=80, seed=91)
    refout = str(tmp_path / "ref.out")
    ref = ab_util.run_reference(ref_real, g, r, refout)

    # ~368k windows, ~19 MB lists: a ~40 MB fake HBM forces the serial
    # plan to >= 2 shards while the table model (clamped to the window
    # bit-length) stays small
    fake_hbm = 40 * 1024 * 1024
    monkeypatch.setattr(plan, "hbm_bytes_per_device", lambda: fake_hbm)

    # use_mesh=False: the serial build loop lives in _foreach_shard_seq
    # (the mesh path builds all of a pass's shards at once instead)
    cfg = RealConfig(textfilename=g, patternfilename=r, outputfilename="-",
                     resident_reads_bytes=1, batch_size=512,
                     use_mesh=False)
    rs = reads_io.parse_reads(r)
    cfg.fastq = rs.fastq
    texts = driver.load_texts(cfg)
    splan = driver._plan_shards(cfg, texts[0].packed, streaming=True)
    assert splan.serial_build and splan.shards >= 2
    result = driver.run_match_unique(cfg, rs, texts)
    buf = io.StringIO()
    write_unique(buf, rs, result, texts, cfg.scores)
    assert buf.getvalue() == ref
