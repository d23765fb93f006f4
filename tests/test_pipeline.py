"""Streaming input pipeline (io/pipeline.py): resident vs streaming
equality, bounded prefetch, IdView storage."""

import numpy as np
import pytest

from real_tpu.config import RealConfig
from real_tpu.engine import driver
from real_tpu.io import fasta, pipeline, reads as reads_io
from real_tpu.io.reads import IdView
from real_tpu.tools import simulate


@pytest.fixture(scope="module")
def data(tmp_path_factory):
    d = tmp_path_factory.mktemp("pipe")
    g = str(d / "g.fa")
    r = str(d / "r.fq")
    with open(g, "w") as f:
        f.write(simulate.random_genome(30000, seed=7, num_fragments=2))
    codes, _ = fasta.parse_genome(g)
    rds = simulate.generate_reads(codes, 700, 64, 0.02, True, seed=8)
    simulate.write_reads(rds, r, True)
    return g, r


def test_idview_roundtrip():
    ids = ["read one", "r2", "", "r4 tab\tin id"]
    v = IdView.from_strings(ids)
    assert list(v) == ids
    assert v == ids
    assert v.bytes_at(3) == ids[3].encode("latin-1")
    assert v[1:3] == ["r2", ""]


def test_streaming_equals_resident(data):
    g, r = data
    rs = reads_io.parse_reads(r)
    cfg = RealConfig(textfilename=g, patternfilename=r, outputfilename="-",
                     batch_size=128, use_mesh=False)
    cfg.fastq = rs.fastq
    texts = driver.load_texts(cfg)

    res_resident = driver.run_match_unique(cfg, rs, texts)
    cfg2 = RealConfig(textfilename=g, patternfilename=r, outputfilename="-",
                      batch_size=128, use_mesh=False,
                      resident_reads_bytes=1)   # force streaming
    cfg2.fastq = rs.fastq
    res_stream = driver.run_match_unique(cfg2, rs, texts)
    for f in ("st", "pos", "frag", "fileid", "errs", "score"):
        np.testing.assert_array_equal(getattr(res_resident, f),
                                      getattr(res_stream, f))

    all_res = driver.run_match_all(cfg, rs, texts, as_arrays=True)
    all_str = driver.run_match_all(cfg2, rs, texts, as_arrays=True)
    for a, b in zip(all_res, all_str):
        np.testing.assert_array_equal(a, b)


def test_streaming_source_reiterates(data):
    g, r = data
    rs = reads_io.parse_reads(r)
    src = pipeline.make_source(rs, 128, 32, resident_budget_bytes=1)
    assert not src.resident
    first = [np.asarray(b.codes).copy() for b in src]
    second = [np.asarray(b.codes) for b in src]
    assert len(first) == len(src.plans) == len(second)
    for a, b in zip(first, second):
        np.testing.assert_array_equal(a, b)


def test_plans_respect_row_align(data):
    g, r = data
    rs = reads_io.parse_reads(r)
    for align in (1, 4, 8):
        for p in pipeline.make_plans(rs, 100, 32, row_align=align):
            assert p.rows % align == 0
