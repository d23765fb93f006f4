"""Checkpoint/resume (SURVEY §5.4): a run killed mid-way must resume from
the saved (matchinfo, shard cursor) and produce identical results, while
actually skipping the completed units."""

import os

import numpy as np
import pytest

from real_tpu.config import RealConfig
from real_tpu.engine import driver
from real_tpu.io import fasta, reads as reads_io
from real_tpu.tools import simulate


@pytest.fixture(scope="module")
def inputs(tmp_path_factory):
    d = tmp_path_factory.mktemp("ckpt")
    g = str(d / "g.fa")
    r = str(d / "r.fa")
    with open(g, "w") as f:
        f.write(simulate.random_genome(30000, seed=61))
    codes, _ = fasta.parse_genome(g)
    simulate.write_reads(
        simulate.generate_reads(codes, 300, 70, 0.03, False, seed=62),
        r, False)
    return g, r


def _cfg(g, r, ckpt=""):
    return RealConfig(textfilename=g, patternfilename=r,
                      outputfilename="-", scores=True, index_shards=3,
                      batch_size=128, use_mesh=False, checkpoint=ckpt)


def _result_tuple(res):
    return tuple(np.asarray(getattr(res, f)).tobytes()
                 for f in ("st", "pos", "frag", "fileid", "errs", "score"))


def test_resume_after_kill(inputs, tmp_path, monkeypatch):
    g, r = inputs
    ckpt = str(tmp_path / "state.npz")
    rs = reads_io.parse_reads(r)
    texts = driver.load_texts(cfg0 := _cfg(g, r))

    full = driver.run_match_unique(cfg0, rs, texts, score_mode="f64")

    # interrupt at the start of unit 2 (after unit 1's checkpoint): the
    # process dies, only the checkpoint file survives
    n_batches = 3   # 300 reads / 128 -> 3 batches
    calls = {"n": 0}
    orig = driver.match_step

    def dying_step(*a, **kw):
        calls["n"] += 1
        if calls["n"] > n_batches:
            raise KeyboardInterrupt("simulated kill")
        return orig(*a, **kw)

    monkeypatch.setattr(driver, "match_step", dying_step)
    with pytest.raises(KeyboardInterrupt):
        driver.run_match_unique(_cfg(g, r, ckpt), rs, texts,
                                score_mode="f64")
    monkeypatch.setattr(driver, "match_step", orig)
    assert os.path.exists(ckpt)

    # resumed run: identical result, and only units 2..3 executed
    calls2 = {"n": 0}

    def counting_step(*a, **kw):
        calls2["n"] += 1
        return orig(*a, **kw)

    monkeypatch.setattr(driver, "match_step", counting_step)
    resumed = driver.run_match_unique(_cfg(g, r, ckpt), rs, texts,
                                      score_mode="f64")
    assert _result_tuple(resumed) == _result_tuple(full)
    assert calls2["n"] == 2 * n_batches     # unit 1 skipped
    assert not os.path.exists(ckpt)         # deleted on success


def test_stale_checkpoint_ignored(inputs, tmp_path):
    g, r = inputs
    ckpt = str(tmp_path / "state2.npz")
    rs = reads_io.parse_reads(r)
    texts = driver.load_texts(_cfg(g, r))
    full = driver.run_match_unique(_cfg(g, r), rs, texts, score_mode="f64")

    # checkpoint written under a DIFFERENT config (seedkmax) must be
    # ignored, not silently reused
    cfg_a = _cfg(g, r, ckpt)
    cfg_a.seedkmax = 1
    from real_tpu.engine import checkpoint as ckpt_mod
    fp = ckpt_mod.fingerprint(cfg_a, texts, rs.num_reads, 3, 8, 8)
    ck = ckpt_mod.Checkpoint(ckpt, fp)
    bogus = [{f: np.full(128, 9, np.float32 if f == "score" else np.int32)
              for f in ("st", "pos", "frag", "fileid", "errs", "score")}
             for _ in range(3)]
    ck.save(3, bogus, [np.zeros(128, bool)] * 3)

    got = driver.run_match_unique(_cfg(g, r, ckpt), rs, texts,
                                  score_mode="f64")
    assert _result_tuple(got) == _result_tuple(full)


def test_edited_readfile_invalidates_checkpoint(inputs, tmp_path):
    """Editing the read file IN PLACE (same name, same read count, same
    byte size) must invalidate the checkpoint: the fingerprint includes
    the input files' (size, mtime) stamps."""
    import shutil
    import time

    g, r0 = inputs
    r = str(tmp_path / "r_edit.fa")
    shutil.copy(r0, r)
    rs = reads_io.parse_reads(r)
    texts = driver.load_texts(_cfg(g, r))
    from real_tpu.engine import checkpoint as ckpt_mod
    fp1 = ckpt_mod.fingerprint(_cfg(g, r), texts, rs.num_reads, 3, 8, 8)

    # rewrite one base in place: size and read count unchanged
    with open(r, "r+b") as f:
        f.seek(200)
        c = f.read(1)
        f.seek(200)
        f.write(b"A" if c != b"A" else b"C")
    time.sleep(0.01)   # ensure mtime_ns moves even on coarse clocks
    os.utime(r)

    rs2 = reads_io.parse_reads(r)
    fp2 = ckpt_mod.fingerprint(_cfg(g, r), texts, rs2.num_reads, 3, 8, 8)
    assert fp1 != fp2


def test_debug_checks_flag(inputs):
    """SURVEY §5.2: the -debug flag runs NaN/invariant checks without
    changing results; the validators catch corrupted outputs."""
    g, r = inputs
    rs = reads_io.parse_reads(r)
    cfg = _cfg(g, r)
    cfg.debug_checks = True
    texts = driver.load_texts(cfg)
    res = driver.run_match_unique(cfg, rs, texts, score_mode="f64")
    # the flag must arm jax_debug_nans on the unique path too
    import jax
    assert jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", False)   # don't leak into others

    ref = driver.run_match_unique(_cfg(g, r), rs, texts, score_mode="f64")
    assert _result_tuple(res) == _result_tuple(ref)

    # the validator must reject a corrupted result
    bad = driver.MatchResult(**{f: np.copy(getattr(res, f)) for f in
                                ("st", "pos", "frag", "fileid", "errs",
                                 "score")})
    matched = (bad.st == 1) | (bad.st == 2)
    bad.errs[np.flatnonzero(matched)[0]] = 99
    with pytest.raises(AssertionError):
        driver.validate_result(cfg, bad, texts)
