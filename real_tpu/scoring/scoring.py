"""Odds-ratio quality scoring.

Reimplements the scoring math of the reference exactly (Scoring.cpp:61-133):
an odds-ratio 4x4 matrix from {similarity, GC content, transition rate,
error rate, GC-mutability bias}, flattened with the quality weighting
log2(oddsRatio[ref][read]) * (1 - Q_PRB[q]) (Scoring.cpp:170) into a
4*4*64 lookup table. A hit's score is 1.0 + sum over aligned bases of
LL[ref, read, q] accumulated in float64 in base order (ComputeScore.hpp),
then narrowed to float32 for the tie/epsilon comparisons
(UpdateUniqueInfo<true>, matchUniqueImplementation.cpp:179-248).

Q_PRB is the reference's hand-rounded table of pow(0.1, q/10) to 7 decimal
places (Scoring.cpp:28-36) — we generate it by rounding, and the test suite
pins it against the reference's printScores output.
"""

from __future__ import annotations

import math

import numpy as np

DFLT_SIMILARITY = 0.995
DFLT_ERR = 0.0
DFLT_TRANS = 0.71
DFLT_GC = 0.41
DFLT_GCMUT_BIAS = 2.0


def q_prb() -> np.ndarray:
    """pow(0.1, q/10) rounded to 7 decimals, 65 entries (Scoring.cpp:28)."""
    q = np.arange(65, dtype=np.float64)
    return np.round(np.power(0.1, q / 10.0), 7)


class Scoring:
    def __init__(self, similarity: float = DFLT_SIMILARITY,
                 gc: float = DFLT_GC, trans: float = DFLT_TRANS,
                 err: float = DFLT_ERR,
                 gcmut_bias: float = DFLT_GCMUT_BIAS) -> None:
        transit = trans * (1.0 - similarity)
        transver = (1.0 - trans) * (1.0 - similarity)

        bg = np.empty(4, dtype=np.float64)
        bg[0] = bg[3] = (1.0 - gc) / 2.0   # A, T
        bg[1] = bg[2] = gc / 2.0           # C, G

        gcmut = gcmut_bias * (1.0 - gc) / gc

        R = np.empty((4, 4), dtype=np.float64)
        # transitions (Scoring.cpp:76-79); base codes A=0 C=1 G=2 T=3
        R[0][2] = transit / (gcmut + 1.0) / (1.0 - gc)           # A->G
        R[3][1] = transit / (gcmut + 1.0) / (1.0 - gc)           # T->C
        R[2][0] = transit / (gcmut + 1.0) / gc * gcmut           # G->A
        R[1][3] = transit / (gcmut + 1.0) / gc * gcmut           # C->T
        # transversions (Scoring.cpp:81-88)
        tv_at = transver / 2.0 / (gcmut + 1.0) / (1.0 - gc)
        tv_gc = transver / 2.0 / (gcmut + 1.0) / gc * gcmut
        R[0][1] = R[3][2] = R[0][3] = R[3][0] = tv_at
        R[1][0] = R[2][3] = R[1][2] = R[2][1] = tv_gc
        # conservation (Scoring.cpp:90-93)
        R[0][0] = 1.0 - R[0][1] - R[0][2] - R[0][3]
        R[3][3] = 1.0 - R[3][0] - R[3][1] - R[3][2]
        R[2][2] = 1.0 - R[2][0] - R[2][1] - R[2][3]
        R[1][1] = 1.0 - R[1][0] - R[1][2] - R[1][3]
        # error adjustment + background normalisation (Scoring.cpp:96-111)
        for x in range(4):
            for y in range(4):
                R[x][y] *= 1.0 - err
                R[x][y] /= bg[y]

        self.odds_ratio = R
        self.bg_freq = bg

        # LL[(ref<<8) | (read<<6) | q] = log2(R[ref][read]) * (1-Q_PRB[q])
        qp = q_prb()
        ll = np.empty(4 * 4 * 64, dtype=np.float64)
        log2 = math.log(2.0)
        for c0 in range(4):
            for c1 in range(4):
                base = math.log(R[c0][c1]) / log2
                for q in range(64):
                    ll[(c0 << 8) | (c1 << 6) | q] = base * (1.0 - qp[q])
        self.ll = ll

    def raw_log_score(self, ref: int, read: int, q: int) -> float:
        return float(self.ll[(ref << 8) | (read << 6) | q])

    def ll_f32_pair(self):
        """Two-float (hi, lo) split of the LUT for TPU float-float
        accumulation (TPU has no native f64)."""
        hi = self.ll.astype(np.float32)
        lo = (self.ll - hi.astype(np.float64)).astype(np.float32)
        return hi, lo


def _split_pair(x: np.ndarray):
    """(hi, lo) f32 split of f64 values: x == hi + lo to f64 accuracy."""
    hi = x.astype(np.float32)
    lo = (x - hi.astype(np.float64)).astype(np.float32)
    return hi, lo


def _dekker_split(x: np.ndarray):
    """Split f32 values into 12-bit halves (hh + hl == x exactly), so
    products of halves are exact in f32 (Dekker's algorithm)."""
    x = x.astype(np.float32)
    c = np.float32(4097.0) * x                     # 2^12 + 1
    hh = (c - (c - x)).astype(np.float32)
    hl = (x - hh).astype(np.float32)
    return hh, hl


class ScoreTables:
    """Constant scoring tables shipped into the match step (~1.3 KB).

    Replaces the old per-batch ScorePrep host precompute: the [B, patl, 4]
    delta arrays are now derived from these tables INSIDE the jitted step
    (engine/matchstep.py:_score_prep_inline), so nothing batch-sized is
    held across steps (the reference equivalently recomputes per pattern,
    ComputeScore.hpp:47-191).

    The rank-1 LUT structure LL[r,p,q] = A[r][p] * B[q] (Scoring.cpp:170,
    A = log2(oddsRatio), B = 1 - Q_PRB) is stored as (hi, lo) f32 splits
    of the f64 factors plus Dekker 12-bit splits of the hi parts, so
    products can be formed to ~2^-45 relative accuracy on a TPU that has
    no native f64."""

    def __init__(self, scoring: "Scoring") -> None:
        log2 = math.log(2.0)
        A = np.log(scoring.odds_ratio) / log2                # f64 [4,4]
        dm = A - np.diag(A)[None, :]                         # A[r,p]-A[p,p]
        self.dm_hi, self.dm_lo = _split_pair(dm)
        self.dm_hh, self.dm_hl = _dekker_split(self.dm_hi)
        self.ad_hi, self.ad_lo = _split_pair(np.diag(A).copy())
        self.ad_hh, self.ad_hl = _dekker_split(self.ad_hi)
        Bq = 1.0 - q_prb()[:64]                              # f64 [64]
        self.b_hi, self.b_lo = _split_pair(Bq)
        self.b_hh, self.b_hl = _dekker_split(self.b_hi)
        self.ll_hi, self.ll_lo = scoring.ll_f32_pair()
        # hashable (static jit arg): tables are baked into the compiled
        # step as XLA constants; one compile per scoring-parameter set
        self._key = scoring.odds_ratio.tobytes()

    def __hash__(self) -> int:
        return hash(self._key)

    def __eq__(self, other) -> bool:
        return isinstance(other, ScoreTables) and self._key == other._key


_TABLE_CACHE = {}


def score_tables(scoring: Scoring) -> ScoreTables:
    key = scoring.odds_ratio.tobytes()
    if key not in _TABLE_CACHE:
        _TABLE_CACHE[key] = ScoreTables(scoring)
    return _TABLE_CACHE[key]
