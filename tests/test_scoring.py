"""Golden test: our scoring LUT vs the reference printScores dump
(printScores.cpp via Scoring::operator<<, Scoring.cpp:182-202)."""

import re
import subprocess

import numpy as np
import pytest

from real_tpu.scoring.scoring import Scoring, q_prb

# reference Q_PRB table literal (Scoring.cpp:28-36) — pinned here so the
# rounding-generation is validated even without the reference binary
_Q_PRB_HEAD = [1.0000000, 0.7943282, 0.6309573, 0.5011872, 0.3981072,
               0.3162278, 0.2511886, 0.1995262, 0.1584893, 0.1258925]
_Q_PRB_TAIL = [0.0000010, 0.0000008, 0.0000006, 0.0000005, 0.0000004]


def test_q_prb_table():
    qp = q_prb()
    assert np.allclose(qp[:10], _Q_PRB_HEAD, rtol=0, atol=0)
    assert np.allclose(qp[60:65], _Q_PRB_TAIL, rtol=0, atol=0)


def test_lut_vs_reference_binary(ref_print_scores, tmp_path):
    # printScores parses full RealOptions, so feed it dummy -t/-p/-o
    t = tmp_path / "t.fa"
    t.write_text(">x\nACGT\n")
    p = tmp_path / "p.fa"
    p.write_text(">r\nACGT\n")
    out = subprocess.run(
        [ref_print_scores, "-t", str(t), "-p", str(p),
         "-o", str(tmp_path / "o")],
        capture_output=True, text=True, check=True).stdout
    sc = Scoring()
    entries = re.findall(
        r"refBase=(\w) readBase=(\w) quality=(\d+) entry=(\S+)", out)
    assert len(entries) == 4 * 4 * 63
    code = {"A": 0, "C": 1, "G": 2, "T": 3}
    for refb, readb, q, val in entries:
        ours = sc.raw_log_score(code[refb], code[readb], int(q))
        # printScores prints with default 6-significant-digit precision
        assert f"{ours:.6g}" == val, (refb, readb, q, val, ours)


def test_lut_f32_pair_reconstruction():
    sc = Scoring()
    hi, lo = sc.ll_f32_pair()
    recon = hi.astype(np.float64) + lo.astype(np.float64)
    # two-float split carries ~48 bits of mantissa
    err = np.abs(recon - sc.ll)
    assert (err <= np.abs(sc.ll) * 2.0**-46 + 2.0**-52).all()
