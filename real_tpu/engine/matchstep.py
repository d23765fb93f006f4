"""The jitted per-(read-batch x index-shard) match step.

TPU-first redesign of the reference's candidate loop (match.hpp:335-416):

  reference (scalar, per read, per list)          this engine (vectorized)
  ------------------------------------------     -------------------------
  bucket table + std::equal_range                one searchsorted + stored-
                                                 signature equality gathers
  for each candidate: diffcountpair(seed)        XOR + pair-fold popcount on
                                                 [B, 12, K] uint32 lanes
  RestMatch popcount loop                        full-window popcount on the
                                                 compacted survivors only
  RangeVector + N-mask checks                    searchsorted + rank gathers
  ComputeScore LUT walk                          rank-1 factored LUT: per-
                                                 batch (hi,lo) delta arrays,
                                                 per-lane VPU selects only
  UpdateUniqueInfo state machine                 lax.scan automaton fold

The pipeline is two-phase to keep the gather volume proportional to REAL
candidates, not to the K candidate lanes:

  phase 1 (cheap, [B, 12, K]):   equal-range membership (stored signature ==
      probe signature), seed distance from the stored complementary pair
      (match.hpp:386), position recovery — only index-array gathers.
  compaction:                    stable-sort the valid lanes to <= S
      survivors per read in reference merge order.
  phase 2 (text gathers, [B, S]): fragment containment, N-freedom, the
      full-window popcount Hamming distance (== seedk + restk of
      RestMatch.hpp:39-81, since the probe pair matches exactly), and the
      odds-ratio score — all on the compacted lanes.

Candidate order is preserved exactly: probes run list 0..5 straight then
list 0..5 reverse-complement (matchUniqueImplementation.cpp:416-488), and
within a probe candidates ascend in sorted-list order (equal signatures in
ascending text position — the reference's stable radix sort). Survivor
compaction uses a stable argsort on that order, so the scores-mode
automaton (which is order-sensitive in epsilon corner cases) replays the
reference's merge order bit-exactly.

The no-scores automaton folds into an associative left-biased monoid
(commutative across shards' disjoint loci — see engine/monoid.py and
tests/test_monoid.py), which is what makes cross-shard merging legal in
that mode; scores mode is order-defined and must replay reference order.

Data-dependent candidate counts are capped at K per probe and S survivors
per read-step; overflow is counted and reported so the driver can rerun
affected reads (reference semantics have no cap; genomic repeats can
exceed any K). Survivor overflow is now detected on *seed-passing*
candidates (pre-verification), which is strictly more conservative than
counting fully verified hits.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from real_tpu.index.signatures import NUM_LISTS, SigConfig, read_segments, \
    read_segments_rc
from real_tpu.text.packed import is_dontcare_free, pair_mismatch_count

POS_SENTINEL = 0x7FFFFFFF

# automaton states (UniqueMatchInfo.hpp:71-78)
NO_MATCH, STRAIGHT, REVERSE, GAPPED, NON_UNIQUE = 0, 1, 2, 3, 4


class MatchState(NamedTuple):
    """Per-read best-hit state (UniqueMatchInfo as struct-of-arrays)."""
    st: jnp.ndarray      # int32 [B]
    pos: jnp.ndarray     # int32 [B]
    frag: jnp.ndarray    # int32 [B]
    fileid: jnp.ndarray  # int32 [B]
    errs: jnp.ndarray    # int32 [B]
    score: jnp.ndarray   # float32 [B]


def initial_state(batch: int) -> MatchState:
    return MatchState(
        st=jnp.zeros(batch, jnp.int32),
        pos=jnp.zeros(batch, jnp.int32),
        frag=jnp.zeros(batch, jnp.int32),
        fileid=jnp.zeros(batch, jnp.int32),
        errs=jnp.zeros(batch, jnp.int32),
        # UniqueMatchInfo<true> ctor: -FLT_MAX (UniqueMatchInfo.hpp:191)
        score=jnp.full(batch, -np.float32(np.finfo(np.float32).max)),
    )


class Survivors(NamedTuple):
    """Compacted verified hits of one step, in reference merge order."""
    valid: jnp.ndarray   # bool [B, S]
    inv: jnp.ndarray     # bool [B, S]
    pos: jnp.ndarray     # int32 [B, S]
    frag: jnp.ndarray    # int32 [B, S]
    k: jnp.ndarray       # int32 [B, S]
    score: jnp.ndarray   # float32 [B, S]
    overflow: jnp.ndarray  # bool [B] — capped candidates/survivors dropped


class ScorePrep(NamedTuple):
    """Per-batch scoring precompute (engine/driver.py:score_prep).

    The reference LUT factorizes (Scoring.cpp:170):
        LL[ref, read, q] = log2(oddsRatio[ref][read]) * (1 - Q_PRB[q])
    so a hit's score splits into a per-read part plus mismatch-only deltas:
        score = 1 + sum_i LL[read_i, read_i, q_i]          (base, per read)
                  + sum_i (LL[ref_i, read_i, q_i]
                           - LL[read_i, read_i, q_i])      (delta, per hit)
    and the delta factor D[r] = (A[r, read_i] - A[read_i, read_i]) * B[q_i]
    depends only on (read base, quality, hypothesized ref base r) — all
    known per batch. The hot per-candidate loop then only *selects* among
    the four precomputed delta lanes by the actual ref base: zero gathers.

    All values are (hi, lo) float32 splits of the float64 quantities; the
    products are formed with Dekker-split multiplies in score_prep, keeping
    ~2^-45 relative accuracy vs the reference's f64 accumulation.
    """
    d4s_hi: jnp.ndarray   # f32 [B, patl, 4] delta if ref base == r, straight
    d4s_lo: jnp.ndarray
    d4r_hi: jnp.ndarray   # f32 [B, patl, 4] same for the RC orientation
    d4r_lo: jnp.ndarray
    base_s_hi: jnp.ndarray  # f32 [B] sum of diagonal (match) terms
    base_s_lo: jnp.ndarray
    base_r_hi: jnp.ndarray
    base_r_lo: jnp.ndarray
    ll_hi: jnp.ndarray    # f32 [1024] LUT split — exact f64 path (CPU tests)
    ll_lo: jnp.ndarray


def null_score_prep(batch: int, patl: int) -> ScorePrep:
    """Placeholder prep for scores=False steps (never read)."""
    z2 = jnp.zeros((batch, patl, 4), jnp.float32)
    z1 = jnp.zeros(batch, jnp.float32)
    zt = jnp.zeros(1024, jnp.float32)
    return ScorePrep(z2, z2, z2, z2, z1, z1, z1, z1, zt, zt)


# ---------------------------------------------------------------------------
# probe construction
# ---------------------------------------------------------------------------

def compute_probes(codes: jnp.ndarray, seedl: int):
    """Probe signatures for a [B, L] batch.

    Returns (probe_sig, probe_comp) of shape [B, 12] uint32; probes 0..5 are
    straight lists s0..s5, probes 6..11 reverse-complement — the exact probe
    order of UniqueMatcher::match (matchUniqueImplementation.cpp:416-488)."""
    sc = SigConfig(seedl)
    m = read_segments(codes[:, :seedl], seedl)
    im = read_segments_rc(codes, seedl)   # segments of RC(read)[0:seedl]
    s_str = sc.compose_pairs(m)
    s_rev = sc.compose_pairs(im)
    sig = jnp.stack(s_str + s_rev, axis=1)
    comp = jnp.stack([s_str[NUM_LISTS - 1 - j] for j in range(NUM_LISTS)]
                     + [s_rev[NUM_LISTS - 1 - j] for j in range(NUM_LISTS)],
                     axis=1)
    return sig, comp


def pack_read_words(codes: jnp.ndarray):
    """Full-read 2-bit packed words, straight and reverse-complement.

    16 bases per uint32, MSB-first, zero-padded tail — the same packing as
    the genome words, so candidate verification is a pure XOR+popcount
    (the word-at-a-time idea of RestMatch.hpp:39-81, widened to the whole
    read: the seed part of the window matches the probe pair exactly, so
    full-window Hamming == seedk + restk). Returns ([B, KW], [B, KW])."""
    patl = codes.shape[1]
    kw = (patl + 15) // 16
    rc = (jnp.uint32(3) - codes[:, ::-1].astype(jnp.uint32)) & 3
    return (_pack_rows(codes.astype(jnp.uint32), kw),
            _pack_rows(rc, kw))


def _pack_rows(c: jnp.ndarray, nw: int) -> jnp.ndarray:
    b, l = c.shape
    pad = nw * 16 - l
    if pad:
        c = jnp.pad(c, ((0, 0), (0, pad)))
    shifts = jnp.asarray(2 * (15 - np.arange(16)), dtype=jnp.uint32)
    return ((c & 3).reshape(b, nw, 16) << shifts).sum(
        axis=2, dtype=jnp.uint32)


def _tail_masks(patl: int, nw: int) -> np.ndarray:
    masks = np.full(nw, 0xFFFFFFFF, dtype=np.uint32)
    tail = patl - 16 * (nw - 1) if nw else 0
    if nw and tail < 16:
        masks[nw - 1] = np.uint32(0xFFFFFFFF) << np.uint32(32 - 2 * tail)
    return masks


# ---------------------------------------------------------------------------
# candidate generation + verification
# ---------------------------------------------------------------------------

def _extract_windows(words: jnp.ndarray, pos: jnp.ndarray, nw: int):
    """Gather nw consecutive 16-base words at arbitrary base offsets.

    Equivalent of AutoTextArray::getTextWord (AutoTextArray.hpp:122-125):
    gathers the nw+1 aligned uint32 words covering the window once, then
    funnel-shifts — (nw+1) gathers for nw words instead of 2*nw."""
    bitpos = pos.astype(jnp.int32) << 1
    idx = bitpos >> 5
    sh = (bitpos & 31).astype(jnp.uint32)
    w = [jnp.take(words, idx + i, mode="clip") for i in range(nw + 1)]
    out = []
    for i in range(nw):
        hi = w[i] << sh
        lo = (w[i + 1] >> (jnp.uint32(31) - sh)) >> 1
        out.append(hi | lo)
    return out                                   # list of nw [.. same shape]


def find_survivors(
        index_sig, index_comp, index_pos, index_bb,   # [6, M] + bucket table
        words, nbits, ncum, frag_offsets,          # text arrays
        codes, quals, read_valid,                  # [B, L], [B, L], [B]
        *, seedl: int, seedkmax: int, totalkmax: int,
        cand_cap: int, survivor_cap: int) -> Survivors:
    """All verified hits of the batch against this index shard, compacted to
    <= survivor_cap per read in reference merge order."""
    B, patl = codes.shape
    K, S = cand_cap, survivor_cap
    restlen = patl - seedl
    kw = (patl + 15) // 16
    M = index_sig.shape[1]

    probe_sig, probe_comp = compute_probes(codes, seedl)
    words_s, words_r = pack_read_words(codes)

    # ---- phase 1: bucket lookup + seed check on [B, 12, K] -----------------
    # one bucket-table gather per probe (the reference's lookup table,
    # match.hpp:376-378); equal-range membership comes from stored-signature
    # equality on the K gathered lanes. An equal range never crosses a
    # bucket, so `bucket count > K` exactly flags any range the K lanes
    # could not cover (driver escalates those reads).
    shift = SigConfig(seedl).bucket_shift
    by_list = probe_sig.T.reshape(2, NUM_LISTS, B).transpose(1, 0, 2) \
        .reshape(NUM_LISTS, 2 * B)
    h = (by_list >> jnp.uint32(shift)).astype(jnp.int32)
    lo = jnp.take_along_axis(index_bb, h, axis=1)
    hi = jnp.take_along_axis(index_bb, h + 1, axis=1)
    overflow = ((hi - lo) > K).reshape(NUM_LISTS, 2, B).any(axis=(0, 1))

    idx_raw = lo[..., None] + jnp.arange(K, dtype=lo.dtype)   # [6, 2B, K]
    in_bounds = idx_raw < jnp.minimum(hi, M)[..., None]
    idx = jnp.minimum(idx_raw, M - 1)

    flat_k = idx.reshape(NUM_LISTS, -1)
    cand_sig = jnp.take_along_axis(index_sig, flat_k, axis=1) \
        .reshape(NUM_LISTS, 2 * B, K)
    cand_comp = jnp.take_along_axis(index_comp, flat_k, axis=1) \
        .reshape(NUM_LISTS, 2, B, K)
    cand_rpos = jnp.take_along_axis(index_pos, flat_k, axis=1) \
        .reshape(NUM_LISTS, 2, B, K)

    sig_eq = ((cand_sig == by_list[..., None]) & in_bounds) \
        .reshape(NUM_LISTS, 2, B, K)

    def to_probe_major(a):   # [6,2,B,K] -> [B, 12, K], probe = strand*6+list
        return a.transpose(2, 1, 0, 3).reshape(B, 2 * NUM_LISTS, K)

    cand_comp = to_probe_major(cand_comp)
    cand_rpos = to_probe_major(cand_rpos)
    sig_eq = to_probe_major(sig_eq)

    seedk = pair_mismatch_count(cand_comp ^ probe_comp[:, :, None])

    inv = (jnp.arange(2 * NUM_LISTS) >= NUM_LISTS)[None, :, None]  # [1,12,1]
    # reverse-complement hits place the indexed seed at the END of the
    # window: pos = rpos - restlen (RestMatch.hpp:84-89)
    matchoffset = jnp.where(inv, restlen, 0).astype(jnp.int32)
    pos = cand_rpos - matchoffset

    cand_valid = (sig_eq
                  & read_valid[:, None, None]
                  & (cand_rpos != POS_SENTINEL)
                  & (cand_rpos >= matchoffset)
                  & (seedk <= seedkmax))

    # ---- compaction to S survivors in merge order --------------------------
    order = jnp.arange(2 * NUM_LISTS * K, dtype=jnp.int32).reshape(
        1, 2 * NUM_LISTS * K)
    fl_valid = cand_valid.reshape(B, -1)
    key = jnp.where(fl_valid, order, 2 * NUM_LISTS * K)
    perm = jnp.argsort(key, axis=1, stable=True)[:, :S]

    def compact(a):
        return jnp.take_along_axis(a.reshape(B, -1), perm, axis=1)

    overflow |= fl_valid.sum(axis=1) > S

    s_valid = compact(fl_valid)
    s_inv = compact(jnp.broadcast_to(inv, cand_valid.shape))
    s_pos = compact(jnp.where(cand_valid, pos, 0))
    s_seedk = compact(jnp.where(cand_valid, seedk, 0))

    # ---- phase 2: text verification on the compacted [B, S] ---------------
    posc = jnp.maximum(s_pos, 0)

    # fragment containment (RangeVector::isPositionValid, RangeVector.hpp:63)
    nfrag = frag_offsets.shape[0] - 1
    s_frag = jnp.searchsorted(frag_offsets, posc.reshape(-1),
                              side="right").reshape(posc.shape) - 1
    s_frag = jnp.clip(s_frag, 0, nfrag - 1).astype(jnp.int32)
    s_valid &= (s_pos + patl) <= frag_offsets[s_frag + 1]

    # N-freedom over the whole window (AutoTextArray::isDontCareFree)
    s_valid &= is_dontcare_free(nbits, ncum, posc, patl)

    # full-window Hamming distance: XOR + 2-bit pair popcount, 16 bases per
    # word (the RestMatch.hpp:39-81 loop, extended over the seed too)
    tw = _extract_windows(words, posc, kw)       # list of kw [B, S] uint32
    masks = _tail_masks(patl, kw)
    patw = jnp.where(s_inv[..., None], words_r[:, None, :],
                     words_s[:, None, :])        # [B, S, KW]
    totalk = jnp.zeros_like(s_seedk)
    for w in range(kw):
        totalk = totalk + pair_mismatch_count(
            (tw[w] ^ patw[..., w]) & jnp.uint32(masks[w]))
    s_valid &= totalk <= totalkmax

    return Survivors(valid=s_valid, inv=s_inv, pos=s_pos, frag=s_frag,
                     k=totalk, score=jnp.zeros_like(s_pos, jnp.float32),
                     overflow=overflow), tw


# ---------------------------------------------------------------------------
# scoring of survivors
# ---------------------------------------------------------------------------

def _two_sum(a_hi, a_lo, b_hi, b_lo):
    """(a_hi+a_lo) + (b_hi+b_lo) as a renormalized (hi, lo) f32 pair."""
    t = a_hi + b_hi
    bp = t - a_hi
    err = (a_hi - (t - bp)) + (b_hi - bp)
    lo = a_lo + (err + b_lo)
    hi2 = t + lo
    lo2 = lo - (hi2 - t)
    return hi2, lo2


def score_survivors(surv: Survivors, tw, codes, quals, prep: ScorePrep,
                    *, score_mode: str) -> Survivors:
    """score = f32(1.0 + sum_i LL[ref_i, read_i, q_i]) accumulated in base
    order (ComputeScore.hpp:47-191). `score_mode`: 'f64' (CPU tests — exact
    reference math, walks the LUT like the reference) or 'ff' (TPU — rank-1
    factored base+delta decomposition, see ScorePrep; equal after f32
    narrowing except within ~2^-40 of a rounding boundary)."""
    B, S = surv.pos.shape
    patl = codes.shape[1]
    kw = len(tw)

    # unpack candidate window text codes from the already-gathered words
    shifts = jnp.asarray(2 * (15 - np.arange(16)), dtype=jnp.uint32)
    tws = jnp.stack(tw, axis=-1)                              # [B,S,kw] u32
    ref = ((tws[..., None] >> shifts) & 3).astype(jnp.uint8) \
        .reshape(B, S, kw * 16)[..., :patl]                   # [B,S,patl]

    if score_mode == "f64":
        # exact reference math: sequential f64 LUT accumulation
        # (ComputeScore.hpp:59-189); CPU-only (requires jax_enable_x64)
        rc = (jnp.uint32(3) - codes[:, ::-1].astype(jnp.uint32)) & 3
        pat = jnp.where(surv.inv[..., None], rc[:, None, :],
                        codes[:, None, :].astype(jnp.uint32))
        q = jnp.where(surv.inv[..., None], quals[:, ::-1][:, None, :],
                      quals[:, None, :]).astype(jnp.int32)
        q = jnp.clip(q, 0, 63).astype(jnp.uint32)
        lut_idx = ((ref.astype(jnp.uint32) << 8) | (pat << 6) | q) \
            .astype(jnp.int32)
        ll = prep.ll_hi.astype(jnp.float64) + prep.ll_lo.astype(jnp.float64)
        contrib = jnp.take(ll, lut_idx)

        def body(i, acc):
            return acc + lax.dynamic_index_in_dim(
                contrib, i, axis=2, keepdims=False)
        total = lax.fori_loop(0, patl, body,
                              jnp.full((B, S), 1.0, jnp.float64))
        return surv._replace(score=total.astype(jnp.float32))

    # ---- 'ff' mode: base + mismatch-delta with (hi, lo) accumulation ------
    base_hi = jnp.where(surv.inv, prep.base_r_hi[:, None],
                        prep.base_s_hi[:, None])
    base_lo = jnp.where(surv.inv, prep.base_r_lo[:, None],
                        prep.base_s_lo[:, None])
    s_hi, s_lo = _two_sum(jnp.float32(1.0), jnp.float32(0.0),
                          base_hi, base_lo)
    inv = surv.inv

    def body(i, acc):
        a_hi, a_lo = acc
        r = lax.dynamic_index_in_dim(ref, i, axis=2, keepdims=False)
        d_s_hi = lax.dynamic_index_in_dim(prep.d4s_hi, i, 1, keepdims=False)
        d_s_lo = lax.dynamic_index_in_dim(prep.d4s_lo, i, 1, keepdims=False)
        d_r_hi = lax.dynamic_index_in_dim(prep.d4r_hi, i, 1, keepdims=False)
        d_r_lo = lax.dynamic_index_in_dim(prep.d4r_lo, i, 1, keepdims=False)
        dh = jnp.where(inv[..., None], d_r_hi[:, None, :],
                       d_s_hi[:, None, :])                           # [B,S,4]
        dl = jnp.where(inv[..., None], d_r_lo[:, None, :],
                       d_s_lo[:, None, :])

        def sel(d):   # select delta lane by ref base: [B,S,4] -> [B,S]
            lohalf = jnp.where((r & 1).astype(bool), d[..., 1], d[..., 0])
            hihalf = jnp.where((r & 1).astype(bool), d[..., 3], d[..., 2])
            return jnp.where((r & 2).astype(bool), hihalf, lohalf)

        return _two_sum(a_hi, a_lo, sel(dh), sel(dl))

    s_hi, s_lo = lax.fori_loop(0, patl, body, (s_hi, s_lo))
    return surv._replace(score=s_hi + s_lo)


# ---------------------------------------------------------------------------
# best-hit automaton fold
# ---------------------------------------------------------------------------

def fold_unique(state: MatchState, surv: Survivors, fileid,
                epsilon, *, scores: bool) -> MatchState:
    """Sequential UpdateUniqueInfo automaton over survivors in merge order
    (matchUniqueImplementation.cpp:97-160 no-scores / :179-248 scores)."""
    fileid = jnp.int32(fileid)
    eps = jnp.float32(epsilon)

    xs = jax.tree.map(lambda a: jnp.swapaxes(a, 0, 1),
                      (surv.valid, surv.inv, surv.pos, surv.frag,
                       surv.k, surv.score))

    def step(st8, x):
        cvalid, cinv, cpos, cfrag, ck, cscore = x
        st, pos, frag, fid, errs, score = st8
        is_open = (st == NO_MATCH) | (st == GAPPED)
        is_hit = (st == STRAIGHT) | (st == REVERSE)
        is_nu = st == NON_UNIQUE
        diff = (cpos != pos) | (cfrag != frag) | (fileid != fid)
        if scores:
            better = cscore > score + eps
            within = cscore > score - eps
            take = cvalid & (is_open | ((is_hit | is_nu) & better))
            tie = cvalid & is_hit & ~better & within & diff
        else:
            better = ck < errs
            take = cvalid & (is_open | ((is_hit | is_nu) & better))
            tie = cvalid & is_hit & (ck == errs) & diff
        new_st = jnp.where(
            take, jnp.where(cinv, REVERSE, STRAIGHT).astype(jnp.int32),
            jnp.where(tie, NON_UNIQUE, st))
        new = MatchState(
            st=new_st,
            pos=jnp.where(take, cpos, pos),
            frag=jnp.where(take, cfrag, frag),
            fileid=jnp.where(take, fileid, fid),
            errs=jnp.where(take, ck, errs),
            score=jnp.where(take & scores, cscore, score),
        )
        return new, None

    final, _ = lax.scan(step, state, xs)
    return final


# ---------------------------------------------------------------------------
# full step
# ---------------------------------------------------------------------------

@functools.partial(
    jax.jit,
    static_argnames=("seedl", "seedkmax", "totalkmax", "cand_cap",
                     "survivor_cap", "scores", "score_mode", "matchall"))
def match_step(index_sig, index_comp, index_pos, index_bb,
               words, nbits, ncum, frag_offsets,
               codes, quals, read_valid,
               state: MatchState, fileid, epsilon,
               prep: ScorePrep,
               *, seedl: int, seedkmax: int, totalkmax: int,
               cand_cap: int, survivor_cap: int,
               scores: bool, score_mode: str, matchall: bool):
    """One (read batch x index shard) step. Returns (new_state, survivors).

    matchall=True skips the automaton (hits go to the host for dedup +
    printing, matchAllImplementation.cpp:99-185)."""
    surv, tw = find_survivors(
        index_sig, index_comp, index_pos, index_bb,
        words, nbits, ncum, frag_offsets,
        codes, quals, read_valid,
        seedl=seedl, seedkmax=seedkmax, totalkmax=totalkmax,
        cand_cap=cand_cap, survivor_cap=survivor_cap)
    if scores:
        surv = score_survivors(surv, tw, codes, quals, prep,
                               score_mode=score_mode)
    if matchall:
        return state, surv
    new_state = fold_unique(state, surv, fileid, epsilon, scores=scores)
    return new_state, surv
