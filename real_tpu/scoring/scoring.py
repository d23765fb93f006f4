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


_PREP_CACHE = {}


def make_score_prep(scoring: Scoring):
    """Build the jitted per-batch scoring precompute (ScorePrep).

    Cached per scoring-parameter set so repeated runs reuse the same jit
    object (and its compilation cache entries).

    Exploits the rank-1 LUT structure LL[r,p,q] = A[r][p] * B[q]
    (Scoring.cpp:170, A = log2(oddsRatio), B = 1 - Q_PRB): precomputes, per
    read and base position, the four mismatch deltas
        D[r] = (A[r, pat_i] - A[pat_i, pat_i]) * B[q_i]
    and the per-read base score sum_i A[pat_i,pat_i] * B[q_i], for both
    orientations, as (hi, lo) f32 pairs with Dekker-split products (~2^-36
    relative accuracy per term vs the reference's f64). The per-candidate
    scoring loop (engine/matchstep.py:score_survivors) then needs no table
    gathers at all."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from real_tpu.engine.matchstep import ScorePrep, _two_sum

    key = scoring.odds_ratio.tobytes()
    if key in _PREP_CACHE:
        return _PREP_CACHE[key]

    log2 = math.log(2.0)
    A = np.log(scoring.odds_ratio) / log2                    # f64 [4,4]
    dm = A - np.diag(A)[None, :]                             # A[r,p]-A[p,p]
    dm_hi, dm_lo = _split_pair(dm)
    dm_hh, dm_hl = _dekker_split(dm_hi)
    ad_hi, ad_lo = _split_pair(np.diag(A).copy())
    ad_hh, ad_hl = _dekker_split(ad_hi)
    Bq = 1.0 - q_prb()[:64]                                  # f64 [64]
    b_hi, b_lo = _split_pair(Bq)
    b_hh, b_hl = _dekker_split(b_hi)
    ll_hi, ll_lo = scoring.ll_f32_pair()

    def product(x_hi, x_lo, x_hh, x_hl, y_hi, y_lo, y_hh, y_hl):
        """(x_hi+x_lo)*(y_hi+y_lo) as a (hi, lo) f32 pair."""
        p1 = x_hh * y_hh                                     # exact
        p2 = x_hh * y_hl + x_hl * y_hh                       # exact terms
        p3 = x_hl * y_hl                                     # exact
        cross = x_hi * y_lo + x_lo * y_hi
        small = (p3 + cross) + p2
        return _two_sum(p1, jnp.float32(0.0), small, jnp.float32(0.0))

    def sel4(tbl, pat):
        """tbl: python-float [4] -> per-element select on base codes."""
        v01 = jnp.where((pat & 1).astype(bool), jnp.float32(tbl[1]),
                        jnp.float32(tbl[0]))
        v23 = jnp.where((pat & 1).astype(bool), jnp.float32(tbl[3]),
                        jnp.float32(tbl[2]))
        return jnp.where((pat & 2).astype(bool), v23, v01)

    def one_strand(pat, q):
        """pat [B,L] u8 codes, q [B,L] int -> (d4_hi, d4_lo, base_hi/lo)."""
        y_hi = jnp.take(jnp.asarray(b_hi), q)
        y_lo = jnp.take(jnp.asarray(b_lo), q)
        y_hh = jnp.take(jnp.asarray(b_hh), q)
        y_hl = jnp.take(jnp.asarray(b_hl), q)

        d_his, d_los = [], []
        for r in range(4):
            x_hi = sel4(dm_hi[r], pat)
            x_lo = sel4(dm_lo[r], pat)
            x_hh = sel4(dm_hh[r], pat)
            x_hl = sel4(dm_hl[r], pat)
            p_hi, p_lo = product(x_hi, x_lo, x_hh, x_hl,
                                 y_hi, y_lo, y_hh, y_hl)
            d_his.append(p_hi)
            d_los.append(p_lo)
        d4_hi = jnp.stack(d_his, axis=-1)                    # [B, L, 4]
        d4_lo = jnp.stack(d_los, axis=-1)

        g_hi, g_lo = product(sel4(ad_hi, pat), sel4(ad_lo, pat),
                             sel4(ad_hh, pat), sel4(ad_hl, pat),
                             y_hi, y_lo, y_hh, y_hl)         # diag terms

        patl = pat.shape[1]

        def body(i, acc):
            return _two_sum(acc[0], acc[1],
                            lax.dynamic_index_in_dim(g_hi, i, 1, False),
                            lax.dynamic_index_in_dim(g_lo, i, 1, False))
        base_hi, base_lo = lax.fori_loop(
            0, patl, body,
            (jnp.zeros(pat.shape[0], jnp.float32),
             jnp.zeros(pat.shape[0], jnp.float32)))
        return d4_hi, d4_lo, base_hi, base_lo

    @jax.jit
    def score_prep(codes, quals):
        pat_s = (codes & 3).astype(jnp.uint8)
        pat_r = (jnp.uint8(3) - pat_s[:, ::-1])
        q = jnp.clip(quals.astype(jnp.int32), 0, 63)
        d4s_hi, d4s_lo, bs_hi, bs_lo = one_strand(pat_s, q)
        d4r_hi, d4r_lo, br_hi, br_lo = one_strand(pat_r, q[:, ::-1])
        return ScorePrep(
            d4s_hi=d4s_hi, d4s_lo=d4s_lo, d4r_hi=d4r_hi, d4r_lo=d4r_lo,
            base_s_hi=bs_hi, base_s_lo=bs_lo,
            base_r_hi=br_hi, base_r_lo=br_lo,
            ll_hi=jnp.asarray(ll_hi), ll_lo=jnp.asarray(ll_lo))

    _PREP_CACHE[key] = score_prep
    return score_prep
