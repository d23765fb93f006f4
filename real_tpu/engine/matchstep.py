"""The jitted per-(read-batch x index-shard) match step.

TPU-first redesign of the reference's candidate loop (match.hpp:335-416):

  reference (scalar, per read, per list)          this engine (vectorized)
  ------------------------------------------     -------------------------
  bucket table + std::equal_range                bucket-bound gathers +
                                                 optional in-bucket bisection
  for each candidate: diffcountpair(seed)        seed-region-masked popcount
                                                 of the verified window
  RestMatch popcount loop                        full-window popcount on the
                                                 compacted survivors only
  RangeVector + N-mask checks                    searchsorted + rank gathers
  ComputeScore LUT walk                          rank-1 factored LUT: (hi,lo)
                                                 delta arrays derived in-jit,
                                                 per-lane VPU selects only
  UpdateUniqueInfo state machine                 lax.scan automaton fold

The pipeline is two-phase to keep the gather volume proportional to REAL
candidates, not to the K candidate lanes:

  phase 1 (gather-free, [B, 12, K] bools): candidate-range COUNTS from the
      bucket table (optionally bisected to the exact equal range) decide
      lane validity — no per-lane index gathers at all.
  compaction:                    stable-sort the valid lanes to <= S
      survivors per read in reference merge order.
  phase 2 (gathers, [B, S]): ONE (position, signature) index gather pair
      per survivor lane (signature equality drops bucket-mates), fragment
      containment, N-freedom, the full-window popcount Hamming distance
      split into seed-region and total counts (== the diffcountpair seed
      check of match.hpp:386 + the rest loop of RestMatch.hpp:39-81), and
      the odds-ratio score — all on the compacted lanes.

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
from real_tpu.ops.pallas_gather import gather_word_windows, use_pallas_gather
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


# (ScoreTables — the ~1.3 KB constant factor tables baked into the
# compiled step — lives in real_tpu/scoring/scoring.py; the per-batch
# delta arrays are derived from it inside the jit, _score_prep_inline.)


# ---------------------------------------------------------------------------
# probe construction
# ---------------------------------------------------------------------------

def compute_probes(codes: jnp.ndarray, seedl: int):
    """Probe signatures for a [B, L] batch.

    Returns (probe_hi, probe_sig) of shape [B, 12] uint32; probes 0..5 are
    straight lists s0..s5, probes 6..11 reverse-complement — the exact probe
    order of UniqueMatcher::match (matchUniqueImplementation.cpp:416-488).
    probe_hi is None for seedl <= 32; for seedl > 32 it carries the high
    uint32 plane of the 64-bit pair signatures."""
    sc = SigConfig(seedl)
    m = read_segments(codes[:, :seedl], seedl)
    im = read_segments_rc(codes, seedl)   # segments of RC(read)[0:seedl]
    if sc.wide:
        p_str = sc.compose_pairs_wide(m)
        p_rev = sc.compose_pairs_wide(im)
        hi = jnp.stack([p[0] for p in p_str] + [p[0] for p in p_rev], axis=1)
        lo = jnp.stack([p[1] for p in p_str] + [p[1] for p in p_rev], axis=1)
        return hi, lo
    s_str = sc.compose_pairs(m)
    s_rev = sc.compose_pairs(im)
    return None, jnp.stack(s_str + s_rev, axis=1)


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
    funnel-shifts — (nw+1) gathers for nw words instead of 2*nw.

    Index math avoids the doubled-position intermediate: pos << 1
    overflows int32 for positions >= 2^30, which silently corrupted
    every window beyond base 1.07G of a >2 Gbp split text (config 5's
    first parity failure).

    On TPU the (nw+1)-word fetch runs as the Pallas row-DMA kernel
    (ops/pallas_gather.py, ~2.4 vs ~9 ns/gathered element for XLA's
    gather). The kernel zero-fills words past the table end where XLA's
    mode="clip" repeats words[-1]; the difference is invisible: those
    bits lie beyond pos+patl, which the per-word tail masks exclude
    from the popcounts and scoring never reads (fragment containment
    caps every valid window at pos+patl <= text end)."""
    p32 = pos.astype(jnp.int32)
    idx = p32 >> 4
    sh = ((p32 & 15) << 1).astype(jnp.uint32)
    if use_pallas_gather(int(np.prod(idx.shape)), nw + 1):
        w = gather_word_windows(words, idx, nw + 1)
    else:
        w = [jnp.take(words, idx + i, mode="clip") for i in range(nw + 1)]
    out = []
    for i in range(nw):
        hi = w[i] << sh
        lo = (w[i + 1] >> (jnp.uint32(31) - sh)) >> 1
        out.append(hi | lo)
    return out                                   # list of nw [.. same shape]


def _seed_masks(patl: int, seedl: int, nw: int):
    """Per-word 2-bit masks selecting the SEED region of the window:
    straight hits carry the seed at window start [0, seedl); reverse hits
    at the end [patl-seedl, patl) (RestMatch.hpp:84-89). Returns
    (mask_straight [nw], mask_reverse [nw]) uint32."""
    def region(a, b):
        out = np.zeros(nw, dtype=np.uint32)
        for w in range(nw):
            w0, w1 = 16 * w, 16 * w + 16
            s, e = max(a, w0), min(b, w1)
            if s < e:
                m = ((np.uint64(1) << np.uint64(2 * (e - s))) - np.uint64(1))
                out[w] = np.uint32(m << np.uint64(2 * (w1 - e)))
        return out
    return region(0, seedl), region(patl - seedl, patl)


def find_survivors(
        index_sig, index_pos, index_bb,            # flat [6*M] + buckets
        words, nbits, ncum, frag_offsets,          # text arrays
        codes, quals, read_valid,                  # [B, L], [B, L], [B]
        *, seedl: int, seedkmax: int, totalkmax: int,
        cand_cap: int, survivor_cap: int,
        bsearch_steps: int = 0, text_has_n: bool = True,
        index_sig_hi=None) -> Survivors:
    """All verified hits of the batch against this index shard, compacted to
    <= survivor_cap per read in reference merge order.

    Gather-minimal design: candidate VALIDITY comes from range COUNTS
    alone (no per-lane signature gathers), and the seed-error count comes
    from the text window itself (a seed-region-masked popcount over the
    same words phase 2 already gathers — identical to the reference's
    diffcountpair on the stored complementary pair, match.hpp:386, for
    every true candidate). The candidate range per probe is the exact
    std::equal_range (bsearch_steps > 0) or its enclosing bucket
    (bsearch_steps == 0, cheap when buckets are sparse). A bucket range
    may over-approximate the equal range; those extra lanes are removed
    AFTER compaction by one stored-signature equality gather on the
    compacted [B, S] — necessary for exactness, not just hygiene: a
    bucket-mate admitting a true hit through the wrong list would move
    its first fold occurrence EARLIER than the reference's probe order,
    which the order-sensitive scores automaton can observe (see
    engine/monoid.py scores non-associativity). Only index gathers that
    remain: the [6, 2B] bucket bounds, the bisection probes, and ONE
    (position, signature) gather pair per compacted survivor lane —
    gather volume is independent of cand_cap."""
    B, patl = codes.shape
    K, S = cand_cap, survivor_cap
    restlen = patl - seedl
    kw = (patl + 15) // 16
    M = index_sig.shape[0] // NUM_LISTS       # flat [6*M] list layout

    sc = SigConfig(seedl)
    probe_hi, probe_sig = compute_probes(codes, seedl)
    words_s, words_r = pack_read_words(codes)

    def to_list_major(a):    # [B, 12] -> [6, 2B] (strand-major per list)
        return a.T.reshape(2, NUM_LISTS, B).transpose(1, 0, 2) \
            .reshape(NUM_LISTS, 2 * B)

    # ---- phase 1: candidate ranges from the bucket table -------------------
    # (the reference's lookup table + equal_range, match.hpp:376-382)
    # bucket width is self-describing: the table has 2^bits + 1 entries
    # per list (a static shape), so no separate parameter can fall out of
    # sync with the build that produced this index
    bucket_bits = (index_bb.shape[0] // NUM_LISTS - 1).bit_length() - 1
    by_list = to_list_major(probe_sig)
    by_list_hi = to_list_major(probe_hi) if probe_hi is not None else None
    if sc.wide:
        h = sc.bucket_key_bits(by_list_hi, by_list,
                               bucket_bits).astype(jnp.int32)
    else:
        h = (by_list >> jnp.uint32(sc.bucket_shift_bits(bucket_bits))) \
            .astype(jnp.int32)
    # flat 1-D gathers throughout: [6, n]-indexed take_along_axis lowers
    # to a batched gather that measured ~14 ns/element on TPU (60% of the
    # whole match step inside the bisection loop). The index arrays
    # arrive FLAT from the build: reshaping tiled [6, M] arrays here
    # would lower to a while-loop layout-conversion copy every step.
    nbuck = index_bb.shape[0] // NUM_LISTS
    list_base_bb = (jnp.arange(NUM_LISTS, dtype=jnp.int32) * nbuck)[:, None]
    # (lo, hi) are ADJACENT table entries — a W=2 slice fetch the Pallas
    # row-DMA gather covers (~10 vs ~16 ns/element at the HBM-scale
    # tables the big configs carry; ops/pallas_gather.py)
    if use_pallas_gather(int(np.prod(h.shape)), 2,
                         table_bytes=index_bb.size * 4):
        lo, hi = gather_word_windows(index_bb, h + list_base_bb, 2)
    else:
        lo = jnp.take(index_bb, h + list_base_bb)
        hi = jnp.take(index_bb, h + 1 + list_base_bb)
    # total real entries per list R_j = bb[j, nb]: invalid-window sentinel
    # entries (sig 0xFFFFFFFF) sort after every real entry (the build
    # orders them so), so clamping every range end to R_j excludes them
    # exactly — without it an all-T probe (real sig == sentinel sig,
    # possible only at seedl 32/64) would see millions of sentinel
    # "candidates" and escalate forever
    real_end = index_bb[nbuck - 1 + (jnp.arange(NUM_LISTS, dtype=jnp.int32)
                                     * nbuck)][:, None]     # [6, 1]
    hi = jnp.minimum(hi, real_end)
    sig_flat = index_sig
    sig_hi_flat = index_sig_hi if sc.wide else None
    list_base = (jnp.arange(NUM_LISTS, dtype=jnp.int32) * M)[:, None]
    if bsearch_steps:
        # refine to the exact equal range with two bisections (first >=
        # probe, first > probe). The true boundary always lies in [l, h2],
        # so an UNCONVERGED bisection (l < h2 after the static step count)
        # must return the conservative side: the lower bound l for `begin`
        # and the upper bound h2 for `end`. The resulting range then only
        # over-approximates the equal range — extra lanes are dropped by
        # the post-compaction signature-equality gather, and an oversized
        # count trips the count>K / survivor>S overflow, forcing escalation
        # (which adds bisection steps). A true hit can never be silently
        # lost to insufficient bisection depth.
        def bisect(gt: bool):
            l, h2 = lo, hi
            for _ in range(bsearch_steps):
                mid = (l + h2) >> 1
                safe = jnp.minimum(mid, M - 1) + list_base
                v = jnp.take(sig_flat, safe)
                if sc.wide:
                    vh = jnp.take(sig_hi_flat, safe)
                    le = (vh < by_list_hi) | ((vh == by_list_hi)
                                              & (v <= by_list))
                    lt = (vh < by_list_hi) | ((vh == by_list_hi)
                                              & (v < by_list))
                else:
                    le, lt = v <= by_list, v < by_list
                live = l < h2
                go_right = (le if gt else lt) & live
                l, h2 = (jnp.where(go_right, mid + 1, l),
                         jnp.where(~go_right & live, mid, h2))
            return l, h2
        begin = bisect(False)[0]
        end = bisect(True)[1]
    else:
        begin, end = lo, hi

    def to_probe_major(a):   # [6, 2B] -> [B, 12], probe = strand*6 + list
        return a.reshape(NUM_LISTS, 2, B).transpose(2, 1, 0).reshape(B, -1)

    count = jnp.minimum(end - begin, jnp.int32(2 * M))   # [6, 2B]
    begin_pm = to_probe_major(begin)                     # [B, 12]
    count_pm = to_probe_major(count)
    lane = jnp.arange(K, dtype=jnp.int32)

    if bsearch_steps:
        # exact equal ranges: lane validity purely from counts, no gathers
        over_probe = count > K
        overflow = over_probe.reshape(NUM_LISTS, 2, B).any(axis=(0, 1))
        cand_valid = (lane[None, None, :] < count_pm[..., None]) \
            & read_valid[:, None, None]                  # [B, 12, K]
    else:
        # bucket ranges (low-occupancy shards): gather the first K lane
        # signatures per probe and take equality as validity — HALF the
        # gather volume of an 8-step bisection, and the survivor count
        # then counts TRUE candidates (a raw bucket-lane count would trip
        # the >S overflow on nearly every read). The equal range escapes
        # the K-lane window only when the bucket holds > K entries and
        # lane K-1 hasn't passed the probe yet — that (rare) case raises
        # overflow -> escalation, which adds bisection steps.
        #
        # TWO-TIER lanes: the flat [B, 12, K] signature gather was 58%
        # of the whole step (47 ms of 81 ms at B=32k, K=8) while bucket
        # occupancy is ~1.4 — only ~1.4% of probes have buckets deeper
        # than 4. Tier 1 gathers K1 = min(4, K) lanes for every probe;
        # probes whose bucket exceeds K1 are compacted to a fixed D-slot
        # list and gather their remaining K-K1 lanes there. Exactness:
        # a deep probe that gets no slot (> D deep probes in the batch,
        # essentially impossible at these occupancies) just flags
        # overflow -> host rerun, like a too-deep bucket always did.
        probe_list = (jnp.arange(2 * NUM_LISTS, dtype=jnp.int32)
                      % NUM_LISTS) * M                    # [12]
        K1 = K if K <= 4 else 4
        lane1 = jnp.arange(K1, dtype=jnp.int32)
        lane_hi = None
        if not sc.wide and use_pallas_gather(B * 2 * NUM_LISTS, K1):
            # tier-1 lanes are K1 CONSECUTIVE list entries from `begin`
            # — the same slice-fetch shape as the window words, so the
            # Pallas row-DMA gather applies (~8 vs ~25 ms per 32k step
            # at HBM-scale signature tables). Lanes that run past the
            # clipped start read neighbor-list entries instead of
            # clamped duplicates; all such lanes satisfy
            # lane >= count (begin+count <= M) and are masked by
            # in_range1 before any consumer sees the value.
            start = jnp.clip(begin_pm, 0, M - 1) + probe_list[None, :]
            lane_sig = jnp.stack(
                gather_word_windows(sig_flat, start, K1), axis=-1)
        else:
            idxs = jnp.clip(begin_pm[..., None] + lane1, 0, M - 1) \
                + probe_list[None, :, None]               # [B, 12, K1]
            lane_sig = jnp.take(sig_flat, idxs)
            if sc.wide:
                lane_hi = jnp.take(sig_hi_flat, idxs)
        eq1 = lane_sig == probe_sig[..., None]
        if sc.wide:
            eq1 &= lane_hi == probe_hi[..., None]

        def le_probe(lo32, hi32):
            if sc.wide:
                return (hi32 < probe_hi) | ((hi32 == probe_hi)
                                            & (lo32 <= probe_sig))
            return lo32 <= probe_sig

        in_range1 = lane1[None, None, :] < count_pm[..., None]
        cand1 = in_range1 & eq1 & read_valid[:, None, None]
        if K1 == K:
            cand_valid = cand1
            last_le = le_probe(lane_sig[..., K - 1],
                               None if not sc.wide else lane_hi[..., K - 1])
            overflow = ((count_pm > K) & last_le).any(axis=1)
        else:
            deep = count_pm > K1                          # [B, 12]
            D = max(B // 2, 512)
            flat_deep = deep.reshape(-1)
            nprobe = flat_deep.shape[0]
            dkey = jnp.where(flat_deep,
                             jnp.arange(nprobe, dtype=jnp.int32),
                             jnp.int32(nprobe))
            dkey = lax.sort(dkey, dimension=0, is_stable=True)[:D]
            got_slot = dkey < nprobe                      # [D]
            pidx = jnp.minimum(dkey, nprobe - 1)
            # scatter index: slotless rows write OUT of range (dropped) —
            # clipping them to nprobe-1 instead would let their False
            # payload race against probe nprobe-1's real value
            pidx_w = jnp.where(got_slot, pidx, jnp.int32(nprobe))
            pbegin = jnp.take(begin_pm.reshape(-1), pidx)
            pcount = jnp.take(count_pm.reshape(-1), pidx)
            plbase = jnp.take(probe_list, pidx % (2 * NUM_LISTS))
            psig = jnp.take(probe_sig.reshape(-1), pidx)
            lane2 = K1 + jnp.arange(K - K1, dtype=jnp.int32)
            didx = jnp.clip(pbegin[:, None] + lane2, 0, M - 1) \
                + plbase[:, None]                         # [D, K-K1]
            dsig = jnp.take(sig_flat, didx)
            eq2 = (dsig == psig[:, None]) & got_slot[:, None]
            dlast = dsig[:, K - K1 - 1]
            if sc.wide:
                phi = jnp.take(probe_hi.reshape(-1), pidx)
                dhi = jnp.take(sig_hi_flat, didx)
                eq2 &= dhi == phi[:, None]
                dlast_le = (dhi[:, K - K1 - 1] < phi) | (
                    (dhi[:, K - K1 - 1] == phi) & (dlast <= psig))
            else:
                dlast_le = dlast <= psig
            eq2 &= lane2[None, :] < pcount[:, None]
            # scatter tier-2 validity back to probe-major lanes
            cand2 = jnp.zeros((nprobe, K - K1), bool).at[pidx_w].set(
                eq2, mode="drop").reshape(B, 2 * NUM_LISTS, K - K1)
            cand2 &= read_valid[:, None, None]
            cand_valid = jnp.concatenate([cand1, cand2], axis=2)
            # overflow: deep probe without a slot, or a still-deeper
            # bucket whose lane K-1 hasn't passed the probe
            over_deep = jnp.zeros(nprobe, bool).at[pidx_w].set(
                (pcount > K) & dlast_le, mode="drop")
            no_slot = flat_deep & ~jnp.zeros(nprobe, bool).at[pidx_w].set(
                got_slot, mode="drop")
            overflow = (over_deep | no_slot).reshape(
                B, 2 * NUM_LISTS).any(axis=1)

    # ---- compaction to S survivors in merge order --------------------------
    # (probe-major = list 0..5 straight then reverse,
    # matchUniqueImplementation.cpp:416-488; lanes ascend in sorted-list
    # order = ascending text position within an equal range)
    order = jnp.arange(2 * NUM_LISTS * K, dtype=jnp.int32).reshape(
        1, 2 * NUM_LISTS * K)
    fl_valid = cand_valid.reshape(B, -1)
    key = jnp.where(fl_valid, order, 2 * NUM_LISTS * K)
    perm = jnp.argsort(key, axis=1, stable=True)[:, :S]  # [B, S]

    overflow |= fl_valid.sum(axis=1) > S

    s_valid = jnp.take_along_axis(fl_valid, perm, axis=1)
    s_probe = perm // K                                  # [B, S] probe id
    s_lane = perm - s_probe * K
    s_inv = s_probe >= NUM_LISTS
    s_list = jnp.where(s_inv, s_probe - NUM_LISTS, s_probe)

    # one position gather per survivor lane; with bisection the stored
    # signature is also gathered and compared — an unconverged bisection
    # over-approximates the equal range, and a bucket-mate admitted
    # through the wrong list would enter the fold EARLIER than reference
    # probe order, observable by the order-sensitive scores automaton.
    # The lane-signature path (bsearch_steps == 0) already proved
    # equality per lane, so the re-check is skipped there.
    s_idx = jnp.take_along_axis(begin_pm, s_probe, axis=1) + s_lane
    flat = s_list * M + jnp.clip(s_idx, 0, M - 1)
    cand_rpos = jnp.take(index_pos, flat)                # [B, S]
    if bsearch_steps:
        cand_sig = jnp.take(index_sig, flat)
        probe_of_lane = jnp.take_along_axis(probe_sig, s_probe, axis=1)
        s_valid &= cand_sig == probe_of_lane
        if sc.wide:
            cand_hi = jnp.take(index_sig_hi, flat)
            s_valid &= cand_hi == jnp.take_along_axis(probe_hi, s_probe,
                                                      axis=1)

    # reverse-complement hits place the indexed seed at the END of the
    # window: pos = rpos - restlen (RestMatch.hpp:84-89)
    matchoffset = jnp.where(s_inv, restlen, 0).astype(jnp.int32)
    s_pos = cand_rpos - matchoffset
    s_valid &= (cand_rpos != POS_SENTINEL) & (cand_rpos >= matchoffset)

    # re-establish reference merge order on the compacted lanes: probe
    # 0..11 major, ascending text position within a probe's equal range
    # (match loop order, matchUniqueImplementation.cpp:416-488 + the
    # stable radix sort's pos order). The index itself is NO longer
    # required to be pos-stable within equal signatures (the phase-major
    # device build isn't), so the order is imposed here — a tiny [B, S]
    # two-key sort instead of a 100x-slower variadic sort of the [6, M]
    # index lists
    okey = jnp.where(s_valid, s_probe, jnp.int32(2 * NUM_LISTS))
    _, s_pos, s_valid, s_inv = lax.sort(
        (okey, s_pos, s_valid, s_inv),
        num_keys=2, dimension=1, is_stable=True)

    # ---- phase 2: text verification on the compacted [B, S] ---------------
    posc = jnp.maximum(s_pos, 0)

    # fragment containment (RangeVector::isPositionValid, RangeVector.hpp:63)
    nfrag = frag_offsets.shape[0] - 1
    if nfrag <= 512:
        # vectorized count beats searchsorted's while-loop lowering on
        # TPU for small fragment tables: frag = #{j>=1: off[j] <= pos}
        s_frag = (frag_offsets[1:-1][None, None, :]
                  <= posc[..., None]).sum(axis=-1).astype(jnp.int32)
    else:
        s_frag = jnp.searchsorted(frag_offsets, posc.reshape(-1),
                                  side="right").reshape(posc.shape) - 1
    s_frag = jnp.clip(s_frag, 0, nfrag - 1).astype(jnp.int32)
    s_valid &= (s_pos + patl) <= frag_offsets[s_frag + 1]

    # N-freedom over the whole window (AutoTextArray::isDontCareFree);
    # statically skipped for N-free texts — 4 of the ~10 phase-2 gathers
    # per survivor lane
    if text_has_n:
        s_valid &= is_dontcare_free(nbits, ncum, posc, patl)

    # full-window Hamming distance: XOR + 2-bit pair popcount, 16 bases per
    # word (the RestMatch.hpp:39-81 loop, extended over the seed too);
    # the seed-region-masked popcount reproduces the reference's seed
    # check diffcountpair(s_b, list_b[ptr].sign) (match.hpp:386)
    tw = _extract_windows(words, posc, kw)       # list of kw [B, S] uint32
    masks = _tail_masks(patl, kw)
    smask_s, smask_r = _seed_masks(patl, seedl, kw)
    patw = jnp.where(s_inv[..., None], words_r[:, None, :],
                     words_s[:, None, :])        # [B, S, KW]
    totalk = jnp.zeros(s_pos.shape, jnp.int32)
    seedk = jnp.zeros(s_pos.shape, jnp.int32)
    for w in range(kw):
        x = (tw[w] ^ patw[..., w]) & jnp.uint32(masks[w])
        totalk = totalk + pair_mismatch_count(x)
        sm = jnp.where(s_inv, jnp.uint32(smask_r[w]), jnp.uint32(smask_s[w]))
        seedk = seedk + pair_mismatch_count(x & sm)
    s_valid &= (seedk <= seedkmax) & (totalk <= totalkmax)

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


def _two_sum_tree(hi, lo, axis: int):
    """Tree reduction of (hi, lo) pairs with _two_sum along `axis`.

    Double-double addition is associative to ~2^-90 relative error, so
    the tree order is at least as accurate as the reference's sequential
    f64 accumulation while being log-depth fully-vectorized (no
    fori_loop serialisation on the VPU)."""
    hi = jnp.moveaxis(hi, axis, -1)
    lo = jnp.moveaxis(lo, axis, -1)
    n = hi.shape[-1]
    while n > 1:
        half = n // 2
        h2, l2 = _two_sum(hi[..., :half], lo[..., :half],
                          hi[..., half:2 * half], lo[..., half:2 * half])
        if n % 2:
            h2 = jnp.concatenate([h2, hi[..., -1:]], axis=-1)
            l2 = jnp.concatenate([l2, lo[..., -1:]], axis=-1)
            n = half + 1
        else:
            n = half
        hi, lo = h2, l2
    return hi[..., 0], lo[..., 0]


def _sel4(tbl, pat):
    """Per-element select of a 4-entry python-float table by base code."""
    v01 = jnp.where((pat & 1).astype(bool), jnp.float32(tbl[1]),
                    jnp.float32(tbl[0]))
    v23 = jnp.where((pat & 1).astype(bool), jnp.float32(tbl[3]),
                    jnp.float32(tbl[2]))
    return jnp.where((pat & 2).astype(bool), v23, v01)


def _ff_product(x_hi, x_lo, x_hh, x_hl, y_hi, y_lo, y_hh, y_hl):
    """(x_hi+x_lo)*(y_hi+y_lo) as a (hi, lo) f32 pair (Dekker splits)."""
    p1 = x_hh * y_hh                                     # exact
    p2 = x_hh * y_hl + x_hl * y_hh                       # exact terms
    p3 = x_hl * y_hl                                     # exact
    cross = x_hi * y_lo + x_lo * y_hi
    small = (p3 + cross) + p2
    return _two_sum(p1, jnp.float32(0.0), small, jnp.float32(0.0))


def _score_prep_inline(codes, quals, tables):
    """Per-batch rank-1 scoring precompute, traced inside the step.

    The reference LUT factorizes (Scoring.cpp:170):
        LL[ref, read, q] = log2(oddsRatio[ref][read]) * (1 - Q_PRB[q])
    so a hit's score splits into a per-read part plus mismatch-only
    deltas:
        score = 1 + sum_i LL[read_i, read_i, q_i]        (base, per read)
                  + sum_i (LL[ref_i, read_i, q_i]
                           - LL[read_i, read_i, q_i])    (delta, per hit)
    where the delta factor D[r] = (A[r,read_i] - A[read_i,read_i])*B[q_i]
    depends only on (read base, quality, hypothesized ref base r). The
    per-candidate scoring then only *selects* among four delta lanes by
    the actual ref base — zero LUT gathers in the hot path.

    Returns ((d4s_hi, d4s_lo), (d4r_hi, d4r_lo), (base_s), (base_r)):
    [B, patl, 4] delta pairs per strand and [B] (hi, lo) base sums."""

    def one_strand(pat, q):
        y_hi = jnp.take(jnp.asarray(tables.b_hi), q)
        y_lo = jnp.take(jnp.asarray(tables.b_lo), q)
        y_hh = jnp.take(jnp.asarray(tables.b_hh), q)
        y_hl = jnp.take(jnp.asarray(tables.b_hl), q)

        d_his, d_los = [], []
        for r in range(4):
            p_hi, p_lo = _ff_product(
                _sel4(tables.dm_hi[r], pat), _sel4(tables.dm_lo[r], pat),
                _sel4(tables.dm_hh[r], pat), _sel4(tables.dm_hl[r], pat),
                y_hi, y_lo, y_hh, y_hl)
            d_his.append(p_hi)
            d_los.append(p_lo)
        d4_hi = jnp.stack(d_his, axis=-1)                    # [B, L, 4]
        d4_lo = jnp.stack(d_los, axis=-1)

        g_hi, g_lo = _ff_product(
            _sel4(tables.ad_hi, pat), _sel4(tables.ad_lo, pat),
            _sel4(tables.ad_hh, pat), _sel4(tables.ad_hl, pat),
            y_hi, y_lo, y_hh, y_hl)                          # diag terms
        base_hi, base_lo = _two_sum_tree(g_hi, g_lo, axis=1)
        return d4_hi, d4_lo, base_hi, base_lo

    pat_s = (codes & 3).astype(jnp.uint8)
    pat_r = (jnp.uint8(3) - pat_s[:, ::-1])
    q = jnp.clip(quals.astype(jnp.int32), 0, 63)
    s = one_strand(pat_s, q)
    r = one_strand(pat_r, q[:, ::-1])
    return s, r


def score_survivors(surv: Survivors, tw, codes, quals, tables,
                    *, score_mode: str) -> Survivors:
    """score = f32(1.0 + sum_i LL[ref_i, read_i, q_i])
    (ComputeScore.hpp:47-191). `score_mode`: 'f64' (CPU tests — exact
    reference math, walks the LUT like the reference) or 'ff' (TPU —
    rank-1 factored base+delta decomposition with double-double tree
    accumulation; equal after f32 narrowing except within ~2^-40 of a
    rounding boundary)."""
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
        ll = (jnp.asarray(tables.ll_hi).astype(jnp.float64)
              + jnp.asarray(tables.ll_lo).astype(jnp.float64))
        contrib = jnp.take(ll, lut_idx)

        def body(i, acc):
            return acc + lax.dynamic_index_in_dim(
                contrib, i, axis=2, keepdims=False)
        total = lax.fori_loop(0, patl, body,
                              jnp.full((B, S), 1.0, jnp.float64))
        return surv._replace(score=total.astype(jnp.float32))

    # ---- 'ff' mode: base + mismatch-delta, double-double tree reduce -----
    (d4s_hi, d4s_lo, bs_hi, bs_lo), (d4r_hi, d4r_lo, br_hi, br_lo) = \
        _score_prep_inline(codes, quals, tables)

    inv = surv.inv                                            # [B, S]
    r1 = (ref & 1).astype(bool)                               # [B, S, patl]
    r2 = (ref & 2).astype(bool)

    def sel_base(d):
        """Select delta lane by ref base: d [B, patl, 4] broadcast over S
        -> [B, S, patl] (each where fuses the [B,1,patl] broadcast; the
        4-lane array is never materialized at [B,S,patl,4])."""
        lohalf = jnp.where(r1, d[:, None, :, 1], d[:, None, :, 0])
        hihalf = jnp.where(r1, d[:, None, :, 3], d[:, None, :, 2])
        return jnp.where(r2, hihalf, lohalf)

    def sel(d_s, d_r):
        return jnp.where(inv[..., None], sel_base(d_r), sel_base(d_s))

    dh = sel(d4s_hi, d4r_hi)
    dl = sel(d4s_lo, d4r_lo)
    sum_hi, sum_lo = _two_sum_tree(dh, dl, axis=2)            # [B, S]

    base_hi = jnp.where(inv, br_hi[:, None], bs_hi[:, None])
    base_lo = jnp.where(inv, br_lo[:, None], bs_lo[:, None])
    s_hi, s_lo = _two_sum(jnp.float32(1.0), jnp.float32(0.0),
                          base_hi, base_lo)
    s_hi, s_lo = _two_sum(s_hi, s_lo, sum_hi, sum_lo)
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

    # partially unrolled: a rolled while loop pays per-iteration launch
    # overhead on TPU for [B]-sized bodies, while full unroll at the
    # escalated S=32 lane count blows up compile time — 8 balances both
    final, _ = lax.scan(step, state, xs,
                        unroll=min(8, surv.valid.shape[1]))
    return final


# ---------------------------------------------------------------------------
# full step
# ---------------------------------------------------------------------------

def scored_survivors(
        index_sig, index_pos, index_bb,
        words, nbits, ncum, frag_offsets,
        codes, quals, read_valid,
        *, tables, seedl: int, seedkmax: int, totalkmax: int,
        cand_cap: int, survivor_cap: int, scores: bool, score_mode: str,
        bsearch_steps: int, text_has_n: bool = True,
        index_sig_hi=None) -> Survivors:
    """Scored survivors of one (batch x shard).

    Cap overflow is reported per read in Survivors.overflow; the driver
    reruns ONLY the overflowed reads host-side with scaled caps against a
    cached index (driver.run_match_unique _depth recursion) — measured
    ~20x cheaper than the earlier device-side whole-batch lax.cond
    escalation, which re-verified all 8192 reads at 4x caps for ~2
    overflowed ones on nearly every chr21 batch (187 ms vs 30 ms/step).
    The reference itself has no caps (std::equal_range is unbounded,
    match.hpp:380-382)."""
    if quals is None:
        # FASTA reads: constant quality 30 (Pattern.hpp:42-45), materialized
        # on device so the host never uploads a quality matrix
        quals = jnp.full(codes.shape, 30, jnp.int8)

    surv, tw = find_survivors(
        index_sig, index_pos, index_bb,
        words, nbits, ncum, frag_offsets,
        codes, quals, read_valid,
        seedl=seedl, seedkmax=seedkmax, totalkmax=totalkmax,
        cand_cap=cand_cap, survivor_cap=survivor_cap,
        bsearch_steps=bsearch_steps, text_has_n=text_has_n,
        index_sig_hi=index_sig_hi)
    if scores:
        surv = score_survivors(surv, tw, codes, quals, tables,
                               score_mode=score_mode)
    return surv


class CompactHits(NamedTuple):
    """Device-compacted matchAll hits of one step (bounded D2H).

    The raw Survivors tensors are [B, S] x 7 arrays and mostly invalid
    lanes (~1 true hit per read): fetching them measured ~1.4 MB/batch —
    the dominant, bandwidth-sensitive cost of matchAll. A stable
    validity sort compacts the true hits to a [H] prefix of four packed
    arrays (~4.6x less D2H at H = 2B)."""
    pos: jnp.ndarray     # int32 [H]
    m1: jnp.ndarray      # int32 [H] = (row << 4) | k
    m2: jnp.ndarray      # int32 [H] = (frag << 1) | inv
    score: jnp.ndarray   # float32 [H]
    count: jnp.ndarray   # int32 [] — true hit count (may exceed H)
    overflow: jnp.ndarray  # bool [B] — per-read cap overflow (OR'd with
    #                        whole-batch hit-count overflow when count > H)


def compact_hits(surv: Survivors, cap: int) -> CompactHits:
    """Compact a step's valid survivor lanes to an [H] prefix.

    Hit order is irrelevant here: matchAll records are globally sorted
    and deduped on the host (_sort_dedup_hits). If more than H lanes are
    valid, EVERY read of the batch is flagged overflow — the driver's
    rerun recomputes all of their hits and discards this batch's
    (matchAllImplementation.cpp has no cap; this keeps exactness).

    A hit locus is found through up to 6 lists (e.g. all six for a
    0-seed-error read), producing byte-identical duplicate lanes that
    the host would drop in unifyMatches anyway — dedup them HERE so the
    compacted count is ~unique hits (otherwise ~6 lanes/read blow the
    H = 2B budget and force spurious whole-batch reruns)."""
    B, S = surv.valid.shape
    H = min(cap, B * S)
    # lane i is a duplicate if another valid lane of the same read has
    # the same (pos, strand) — identical alignment, identical record
    # fields. Two dedup constructions by lane count:
    #   S <= 16 (production): [B, S, S] pairwise mask — S*S bools/read
    #     are VPU-free at these widths, while a variadic per-row sort
    #     measured ~1.7 s per 32k batch (r5)
    #   S > 16 (escalation ladder, S up to 128): per-row sort-adjacent
    #     dedup on small rerun batches (B <= 512) — the pairwise mask
    #     would materialize B x 16k bools (VERDICT r4 weak #5)
    if S <= 16:
        same = ((surv.pos[:, :, None] == surv.pos[:, None, :])
                & (surv.inv[:, :, None] == surv.inv[:, None, :])
                & surv.valid[:, :, None] & surv.valid[:, None, :])
        earlier = (jnp.arange(S)[None, :] < jnp.arange(S)[:, None])[None]
        dup = (same & earlier).any(axis=2)
        pos_s, inv_s = surv.pos, surv.inv.astype(jnp.int32)
        k_s, frag_s, score_s = surv.k, surv.frag, surv.score
        v = (surv.valid & ~dup).reshape(-1)
    else:
        invalid = (~surv.valid).astype(jnp.int32)
        _, pos_s, inv_s, valid_s, k_s, frag_s, score_s = lax.sort(
            (invalid, surv.pos, surv.inv.astype(jnp.int32),
             surv.valid, surv.k, surv.frag, surv.score),
            num_keys=3, dimension=1, is_stable=False)
        prev_same = jnp.concatenate(
            [jnp.zeros((B, 1), bool),
             (pos_s[:, 1:] == pos_s[:, :-1])
             & (inv_s[:, 1:] == inv_s[:, :-1])
             & valid_s[:, 1:] & valid_s[:, :-1]], axis=1)
        v = (valid_s & ~prev_same).reshape(-1)
    row = (jnp.arange(B * S, dtype=jnp.int32) // S)
    m1 = (row << 4) | jnp.clip(k_s.reshape(-1), 0, 15)
    m2 = (frag_s.reshape(-1) << 1) | inv_s.reshape(-1)
    key = (~v).astype(jnp.uint32)
    _, pos, m1, m2, score = lax.sort(
        (key, pos_s.reshape(-1), m1, m2, score_s.reshape(-1)),
        num_keys=1, dimension=0, is_stable=True)
    count = v.sum().astype(jnp.int32)
    over = surv.overflow | (count > H)
    return CompactHits(pos=pos[:H], m1=m1[:H], m2=m2[:H], score=score[:H],
                       count=count, overflow=over)


@functools.partial(
    jax.jit,
    static_argnames=("tables", "seedl", "seedkmax", "totalkmax", "cand_cap",
                     "survivor_cap", "scores", "score_mode", "matchall",
                     "bsearch_steps", "text_has_n"))
def match_step(index_sig, index_pos, index_bb,
               words, nbits, ncum, frag_offsets,
               codes, quals, read_valid,
               state: MatchState, fileid, epsilon,
               index_sig_hi=None,
               *, tables=None, seedl: int, seedkmax: int, totalkmax: int,
               cand_cap: int, survivor_cap: int,
               scores: bool, score_mode: str, matchall: bool,
               bsearch_steps: int = 0, text_has_n: bool = True):
    """One (read batch x index shard) step. Returns (new_state, survivors).

    `tables` is the static ScoreTables constant set (scoring/scoring.py),
    baked into the compiled program; None when scores=False. quals=None
    means FASTA constant quality 30, materialized on device.
    matchall=True skips the automaton (hits go to the host for dedup +
    printing, matchAllImplementation.cpp:99-185)."""
    surv = scored_survivors(
        index_sig, index_pos, index_bb,
        words, nbits, ncum, frag_offsets,
        codes, quals, read_valid,
        tables=tables, seedl=seedl, seedkmax=seedkmax, totalkmax=totalkmax,
        cand_cap=cand_cap, survivor_cap=survivor_cap, scores=scores,
        score_mode=score_mode, bsearch_steps=bsearch_steps,
        text_has_n=text_has_n,
        index_sig_hi=index_sig_hi)
    if matchall:
        # hit capacity scales with the survivor cap: escalated reruns on
        # repeat-rich genomes legitimately return hundreds of hits per
        # read (matchAll has no reference-side cap), and a fixed 2B cap
        # would flag whole-batch overflow forever
        cap = max(2 * codes.shape[0],
                  codes.shape[0] * surv.valid.shape[1] // 2)
        return state, compact_hits(surv, cap=cap)
    new_state = fold_unique(state, surv, fileid, epsilon, scores=scores)
    return new_state, surv
