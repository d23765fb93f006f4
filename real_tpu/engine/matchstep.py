"""The jitted per-(read-batch x index-shard) match step.

TPU-first redesign of the reference's candidate loop (match.hpp:335-416):

  reference (scalar, per read, per list)          this engine (vectorized)
  ------------------------------------------     -------------------------
  bucket table + std::equal_range                jnp.searchsorted (x2)
  for each candidate: diffcountpair(seed)        gathers + XOR + pair-fold
  RestMatch popcount loop                        + lax.population_count on
  RangeVector + N-mask checks                    [B, 12, K] uint32 lanes
  ComputeScore LUT walk                          LUT gather on survivors
  UpdateUniqueInfo state machine                 lax.scan automaton fold

Candidate order is preserved exactly: probes run list 0..5 straight then
list 0..5 reverse-complement (matchUniqueImplementation.cpp:416-488), and
within a probe candidates ascend in sorted-list order (equal signatures in
ascending text position — the reference's stable radix sort). Survivor
compaction uses a stable argsort on that order, so the scores-mode
automaton (which is order-sensitive in epsilon corner cases) replays the
reference's merge order bit-exactly.

The no-scores automaton is provably order-free (min-errors with tie =>
NonUnique is an associative, commutative monoid — see engine/monoid.py),
which is what makes cross-shard all-reduce merging legal in that mode.

Data-dependent candidate counts are capped at K per probe and S survivors
per read-step; overflow is counted and reported so the driver can rerun
affected reads (reference semantics have no cap; genomic repeats can
exceed any K).
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
from real_tpu.text.packed import extract_bases16, pair_mismatch_count

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


def pack_rest_words(codes: jnp.ndarray, seedl: int):
    """Rest (beyond-seed) 2-bit packed words, straight and reverse.

    straight: read[seedl:patl]; reverse: RC(read)[0:restlen] — matching
    RestMatch::fillRestWordArrayMapped / ...ReverseMapped
    (RestMatch.hpp:215-318). Packed 16 bases per uint32, MSB-first,
    zero-padded tail. Returns ([B, RW], [B, RW]) with RW = ceil(restlen/16).
    """
    patl = codes.shape[1]
    restlen = patl - seedl
    rw = (restlen + 15) // 16
    if rw == 0:
        z = jnp.zeros((codes.shape[0], 0), jnp.uint32)
        return z, z
    rc = (jnp.uint32(3) - codes[:, ::-1].astype(jnp.uint32)) & 3
    return (_pack_rows(codes[:, seedl:].astype(jnp.uint32), rw),
            _pack_rows(rc[:, :restlen], rw))


def _pack_rows(c: jnp.ndarray, rw: int) -> jnp.ndarray:
    b, l = c.shape
    pad = rw * 16 - l
    if pad:
        c = jnp.pad(c, ((0, 0), (0, pad)))
    shifts = jnp.asarray(2 * (15 - np.arange(16)), dtype=jnp.uint32)
    return ((c & 3).reshape(b, rw, 16) << shifts).sum(
        axis=2, dtype=jnp.uint32)


# ---------------------------------------------------------------------------
# candidate generation + verification
# ---------------------------------------------------------------------------

def _rest_tail_masks(restlen: int, rw: int) -> np.ndarray:
    masks = np.full(rw, 0xFFFFFFFF, dtype=np.uint32)
    tail = restlen - 16 * (rw - 1) if rw else 0
    if rw and tail < 16:
        masks[rw - 1] = np.uint32(0xFFFFFFFF) << np.uint32(32 - 2 * tail)
    return masks


def find_survivors(
        index_sig, index_comp, index_pos,          # [6, M]
        words, nbits, ncum, frag_offsets,          # text arrays
        codes, quals, read_valid,                  # [B, L], [B, L], [B]
        *, seedl: int, seedkmax: int, totalkmax: int,
        cand_cap: int, survivor_cap: int) -> Survivors:
    """All verified hits of the batch against this index shard, compacted to
    <= survivor_cap per read in reference merge order."""
    B, patl = codes.shape
    K, S = cand_cap, survivor_cap
    restlen = patl - seedl
    rw = (restlen + 15) // 16

    probe_sig, probe_comp = compute_probes(codes, seedl)
    rest_s, rest_r = pack_rest_words(codes, seedl)

    # searchsorted per list: probes regrouped [6 lists, 2 strands * B]
    by_list = probe_sig.T.reshape(2, NUM_LISTS, B).transpose(1, 0, 2) \
        .reshape(NUM_LISTS, 2 * B)
    lo = jax.vmap(
        lambda s, v: jnp.searchsorted(s, v, side="left"))(index_sig, by_list)
    hi = jax.vmap(
        lambda s, v: jnp.searchsorted(s, v, side="right"))(index_sig, by_list)
    cnt = (hi - lo).reshape(NUM_LISTS, 2, B)
    lo = lo.reshape(NUM_LISTS, 2, B)

    M = index_sig.shape[1]
    idx = lo[..., None] + jnp.arange(K, dtype=lo.dtype)      # [6,2,B,K]
    in_range = jnp.arange(K) < cnt[..., None]
    idx = jnp.minimum(idx, M - 1)

    flat_idx = idx.reshape(NUM_LISTS, -1)
    cand_comp = jnp.take_along_axis(index_comp, flat_idx, axis=1) \
        .reshape(NUM_LISTS, 2, B, K)
    cand_rpos = jnp.take_along_axis(index_pos, flat_idx, axis=1) \
        .reshape(NUM_LISTS, 2, B, K)

    def to_probe_major(a):   # [6,2,B,K] -> [B, 12, K], probe = strand*6+list
        return a.transpose(2, 1, 0, 3).reshape(B, 2 * NUM_LISTS, K)

    cand_comp = to_probe_major(cand_comp)
    cand_rpos = to_probe_major(cand_rpos)
    in_range = to_probe_major(in_range)
    overflow = (cnt > K).any(axis=(0, 1))                    # [B]

    seedk = pair_mismatch_count(cand_comp ^ probe_comp[:, :, None])

    inv = (jnp.arange(2 * NUM_LISTS) >= NUM_LISTS)[None, :, None]  # [1,12,1]
    matchoffset = jnp.where(inv, restlen, 0).astype(jnp.int32)
    pos = cand_rpos - matchoffset

    valid = (in_range
             & read_valid[:, None, None]
             & (cand_rpos != POS_SENTINEL)
             & (cand_rpos >= matchoffset)
             & (seedk <= seedkmax))

    # fragment containment (RangeVector::isPositionValid) + N-freedom
    nfrag = frag_offsets.shape[0] - 1
    frag = jnp.searchsorted(frag_offsets,
                            jnp.maximum(pos, 0).reshape(-1),
                            side="right").reshape(pos.shape) - 1
    frag = jnp.clip(frag, 0, nfrag - 1).astype(jnp.int32)
    frag_end = frag_offsets[frag + 1]
    valid &= (pos + patl) <= frag_end

    from real_tpu.text.packed import is_dontcare_free
    valid &= is_dontcare_free(nbits, ncum, jnp.maximum(pos, 0), patl)

    # rest Hamming distance (RestMatch.hpp:39-81)
    restpos = pos + jnp.where(inv, 0, seedl)
    restk = jnp.zeros_like(seedk)
    if rw:
        masks = jnp.asarray(_rest_tail_masks(restlen, rw))
        patrest = jnp.where(inv[..., None],
                            rest_r[:, None, None, :],
                            rest_s[:, None, None, :])      # [B,12,1->K? , RW]
        for w in range(rw):
            tw = extract_bases16(words, jnp.maximum(restpos, 0) + 16 * w)
            x = (tw ^ patrest[..., w]) & masks[w]
            restk = restk + pair_mismatch_count(x)
    totalk = seedk + restk
    valid &= totalk <= totalkmax

    # ---- compaction to S survivors in merge order --------------------------
    order = jnp.arange(2 * NUM_LISTS * K, dtype=jnp.int32).reshape(
        1, 2 * NUM_LISTS, K)
    fl_valid = valid.reshape(B, -1)
    key = jnp.where(fl_valid, order.reshape(1, -1), 2 * NUM_LISTS * K)
    perm = jnp.argsort(key, axis=1, stable=True)[:, :S]

    def compact(a):
        return jnp.take_along_axis(a.reshape(B, -1), perm, axis=1)

    n_surv = fl_valid.sum(axis=1)
    overflow |= n_surv > S

    s_valid = compact(fl_valid)
    s_inv = compact(jnp.broadcast_to(inv, valid.shape))
    s_pos = compact(jnp.where(valid, pos, 0))
    s_frag = compact(jnp.where(valid, frag, 0))
    s_k = compact(jnp.where(valid, totalk, 0))

    return Survivors(valid=s_valid, inv=s_inv, pos=s_pos, frag=s_frag,
                     k=s_k, score=jnp.zeros_like(s_pos, jnp.float32),
                     overflow=overflow)


# ---------------------------------------------------------------------------
# scoring of survivors
# ---------------------------------------------------------------------------

def score_survivors(surv: Survivors, words, codes, quals,
                    ll_hi, ll_lo, *, score_mode: str) -> Survivors:
    """score = f32(1.0 + sum_i LL[ref_i, read_i, q_i]) accumulated in base
    order (ComputeScore.hpp:47-191). `score_mode`: 'f64' (CPU tests — exact
    reference math) or 'ff' (TPU — two-float compensated accumulation, equal
    after f32 narrowing except within ~2^-48 of rounding boundaries)."""
    B, S = surv.pos.shape
    patl = codes.shape[1]
    kw = (patl + 15) // 16

    posc = jnp.maximum(surv.pos, 0)
    # text codes: kw word-gathers then in-register unpack
    tw = jnp.stack([extract_bases16(words, posc + 16 * w)
                    for w in range(kw)], axis=-1)            # [B,S,kw] u32
    shifts = jnp.asarray(2 * (15 - np.arange(16)), dtype=jnp.uint32)
    ref = ((tw[..., None] >> shifts) & 3).reshape(B, S, kw * 16)[..., :patl]

    rc = (jnp.uint32(3) - codes[:, ::-1].astype(jnp.uint32)) & 3
    pat = jnp.where(surv.inv[..., None], rc[:, None, :],
                    codes[:, None, :].astype(jnp.uint32))
    q = jnp.where(surv.inv[..., None], quals[:, ::-1][:, None, :],
                  quals[:, None, :]).astype(jnp.int32)
    # reference indexes LL with the raw quality (UB if out of 0..63,
    # Scoring.hpp getRawLogScoreTable); we clamp
    q = jnp.clip(q, 0, 63).astype(jnp.uint32)

    lut_idx = ((ref << 8) | (pat << 6) | q).astype(jnp.int32)  # [B,S,patl]

    if score_mode == "f64":
        ll = ll_hi.astype(jnp.float64) + ll_lo.astype(jnp.float64)
        contrib = jnp.take(ll, lut_idx)

        def body(i, acc):
            return acc + lax.dynamic_index_in_dim(
                contrib, i, axis=2, keepdims=False)
        total = lax.fori_loop(0, patl, body,
                              jnp.full((B, S), 1.0, jnp.float64))
        score = total.astype(jnp.float32)
    else:
        chi = jnp.take(ll_hi, lut_idx)
        clo = jnp.take(ll_lo, lut_idx)

        def body(i, acc):
            s_hi, s_lo = acc
            a_hi = lax.dynamic_index_in_dim(chi, i, axis=2, keepdims=False)
            a_lo = lax.dynamic_index_in_dim(clo, i, axis=2, keepdims=False)
            # TwoSum(s_hi, a_hi)
            t = s_hi + a_hi
            bp = t - s_hi
            err = (s_hi - (t - bp)) + (a_hi - bp)
            s_lo = s_lo + (err + a_lo)
            # renormalise
            hi2 = t + s_lo
            lo2 = s_lo - (hi2 - t)
            return (hi2, lo2)
        hi2, lo2 = lax.fori_loop(
            0, patl, body,
            (jnp.full((B, S), 1.0, jnp.float32),
             jnp.zeros((B, S), jnp.float32)))
        score = hi2 + lo2

    return surv._replace(score=score)


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
def match_step(index_sig, index_comp, index_pos,
               words, nbits, ncum, frag_offsets,
               codes, quals, read_valid,
               state: MatchState, fileid, epsilon,
               ll_hi, ll_lo,
               *, seedl: int, seedkmax: int, totalkmax: int,
               cand_cap: int, survivor_cap: int,
               scores: bool, score_mode: str, matchall: bool):
    """One (read batch x index shard) step. Returns (new_state, survivors).

    matchall=True skips the automaton (hits go to the host for dedup +
    printing, matchAllImplementation.cpp:99-185)."""
    surv = find_survivors(
        index_sig, index_comp, index_pos, words, nbits, ncum, frag_offsets,
        codes, quals, read_valid,
        seedl=seedl, seedkmax=seedkmax, totalkmax=totalkmax,
        cand_cap=cand_cap, survivor_cap=survivor_cap)
    if scores:
        surv = score_survivors(surv, words, codes, quals, ll_hi, ll_lo,
                               score_mode=score_mode)
    if matchall:
        return state, surv
    new_state = fold_unique(state, surv, fileid, epsilon, scores=scores)
    return new_state, surv
