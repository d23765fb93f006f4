"""Device-side index construction.

TPU-first replacement for the reference's incremental text scan + OpenMP
radix sort (MapTextFile.hpp:181-230, ListSet.hpp:41-63,
ParallelRadixSort.hpp): one vectorized pass computes all windows' four
segments, composes the six pair signatures, and `lax.sort` produces the six
sorted lists. Each list row carries (signature, position) only — no ptr
cross-links (u_sort.hpp:29-40, Mask.hpp:36-40): the matcher re-derives the
seed error count from the verified text window itself. For seedl > 32 the
signature is a (hi, lo) uint32 plane pair sorted lexicographically (the
reference's u_int64_t path, real.cpp:217-221).

PHASE-MAJOR extraction: window positions are processed in 16 phase blocks
(phase p = positions congruent to p mod 16), so every segment extraction
is a funnel shift over STATIC slices of the packed words — no gathers, no
[M/16, 16] interleave (a narrow-minor-dim layout the TPU pads 8x and
relayouts; the interleaved r3 build spent 2.45 s of its 4.8 s there at
chr21 scale). The resulting per-list entry order is phase-blocked, NOT
position order — which is fine because the matcher imposes reference
merge order on the compacted survivor lanes itself (engine/matchstep.py:
the (probe, pos) lane sort); within an equal signature run the index
order is free.

Sentinels: invalid windows (containing N / shard padding) get signature
0xFFFFFFFF and position sentinel 0x7FFFFFFF. Everything downstream
(bucket counts, the matcher's real-end clamp) relies on sentinels sorting
AFTER every real entry. That is automatic except when a real pair
signature can equal 0xFFFFFFFF — an all-T segment pair at seedl 32/64 —
in which case one extra stable pre-sort pass on the sentinel flag orders
them correctly (PackedText.order_sentinels, detected at pack time; a
plain single-key sort would interleave real all-T entries with sentinels
and silently truncate their bucket range).

A per-list bucket table over the top `bucket_bits` signature bits
(getLookupTable.hpp:26-51; the reference uses 22 sample bits) turns the
probe's equal-range search into one gather pair. bucket_bits scales with
the shard's window count (occupancy ~1) so big genomes keep ~empty
buckets and the matcher can skip in-bucket bisection entirely.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from real_tpu.index.signatures import NUM_LISTS, SigConfig
from real_tpu.text.packed import PackedText

POS_SENTINEL = jnp.int32(0x7FFFFFFF)
SIG_SENTINEL = jnp.uint32(0xFFFFFFFF)


@dataclasses.dataclass
class SignatureIndex:
    """Six sorted pair-signature lists over one text block/shard.

    No complementary-pair array: the matcher derives the seed error count
    from the text window itself (engine/matchstep.py find_survivors), so
    the index is (sig, pos) only — 48 B/window vs the reference's
    cross-linked Mask records (Mask.hpp:36-40)."""
    sig: jnp.ndarray    # uint32 [6*M] flat sorted lists (lo plane if wide)
    pos: jnp.ndarray    # int32  [6*M] window position (sentinel if invalid)
    bb: jnp.ndarray     # int32  [6*(2^bucket_bits+1)] flat bucket begins
    seedl: int
    bucket_bits: int
    # high uint32 plane of 64-bit signatures (seedl > 32, the reference's
    # u_int64_t dispatch real.cpp:217-221); None for seedl <= 32
    sig_hi: Optional[jnp.ndarray] = None


def pick_bucket_bits(seedl: int, num_windows: int) -> int:
    """Bucket-table width for a shard: enough bits that mean occupancy is
    ~1 (so the bucket range IS the equal range for almost every probe and
    the matcher needs no in-bucket bisection), capped at 25 (the 6 tables
    then cost 6*(2^25+1)*4 B = 805 MB HBM — accounted by parallel/plan)
    and at the signature width. The reference's fixed 22 sample bits
    (getSampleBits.hpp:22-25) left chr21-scale buckets 11-deep."""
    bits = max(num_windows - 1, 1).bit_length()
    # the 12-bit floor must not exceed the signature width (= seedl bits):
    # for legal seedl 4/8 a floored width would make seedl - bucket_bits
    # negative (an illegal uint32 shift in the narrow device build)
    return min(max(12, min(bits, 25)), seedl)


def _phase_words(words: jnp.ndarray, word_lo, nk: int, extra: int):
    """pw[p][k] = 16-base word at base position 16*(word_lo + k) + p, for
    k in [0, nk + extra). Pure static slices + funnel shifts."""
    L = nk + extra
    words = jnp.concatenate([words, jnp.zeros(L + 2, words.dtype)])
    w = lax.dynamic_slice(words, (word_lo,), (L + 1,))
    w0, w1 = w[:-1], w[1:]
    pw = []
    for p in range(16):
        sh = jnp.uint32(2 * p)
        hi = w0 << sh
        lo = (w1 >> (jnp.uint32(31) - sh)) >> 1
        pw.append(hi | lo)
    return pw


def build_lists_impl(words: jnp.ndarray, nb16: jnp.ndarray,
                     ncum16: jnp.ndarray,
                     start: jnp.ndarray, num_windows: int, seedl: int,
                     n: jnp.ndarray, *, order_sentinels: bool = False,
                     bucket_bits: int = 0):
    """Build sorted lists + bucket tables covering windows
    [start, start + 16*ceil(num_windows/16)). `start` must be a multiple
    of 16. Positions past min(start + num_windows, n - seedl) - 1 become
    sentinels. Returns (sig_hi | None, sig, pos, bb) FLAT arrays with
    M = 16*ceil(num_windows/16) entries per list."""
    sc = SigConfig(seedl)
    bucket_bits = bucket_bits or pick_bucket_bits(seedl, num_windows)
    word_lo = start.astype(jnp.int32) >> 4
    C = -(-num_windows // 16)            # k-extent per phase
    # extra words beyond C: max segment start offset 3*(seedl//4) <= 48
    # plus the validity group offset (seedl//16 + 1) and funnel spill
    extra = (15 + 3 * (seedl // 4)) // 16 + seedl // 16 + 3
    pw = _phase_words(words, word_lo, C, extra)

    # wildcard counts at 16-base granularity, phase-sliced
    GL = C + seedl // 16 + 3
    nb16p = jnp.concatenate([nb16, jnp.zeros(GL + 2, nb16.dtype)])
    nb16s = lax.dynamic_slice(nb16p, (word_lo,), (GL,))
    ncum16p = jnp.concatenate([ncum16, jnp.full(GL + 2, ncum16[-1],
                                                ncum16.dtype)])
    ncum16s = lax.dynamic_slice(ncum16p, (word_lo,), (GL,))

    def nfree_phase(p: int) -> jnp.ndarray:
        """valid[k] = window at pos start+16k+p has no N in [pos, pos+seedl)."""
        def npre(off_base: int):
            d, p2 = divmod(p + off_base, 16)
            g = nb16s[d:d + C]
            cum = ncum16s[d:d + C]
            if p2 == 0:
                return cum
            return cum + lax.population_count(
                g >> jnp.uint32(16 - p2)).astype(jnp.int32)
        return (npre(seedl) - npre(0)) == 0

    def seg_phase(p: int, off: int, width: int) -> jnp.ndarray:
        # segment at base position 16k + p + off = 16(k+d) + p2
        d, p2 = divmod(p + off, 16)
        return pw[p2][d:d + C] >> jnp.uint32(2 * (16 - width))

    # per-phase signatures and validity, concatenated phase-blocked
    sig_rows = [[] for _ in range(NUM_LISTS)]       # narrow or lo plane
    hi_rows = [[] for _ in range(NUM_LISTS)] if sc.wide else None
    pos_rows = []
    for p in range(16):
        segs = [seg_phase(p, off, w)
                for off, w in zip(sc.seg_offsets, sc.syms)]
        pos_p = (start + jnp.arange(C, dtype=jnp.int32) * 16 + p)
        valid = (pos_p <= (n - seedl)) \
            & (pos_p < start + num_windows) & nfree_phase(p)
        pos_rows.append(jnp.where(valid, pos_p, POS_SENTINEL))
        if sc.wide:
            pairs = sc.compose_pairs_wide(segs)
            for j in range(NUM_LISTS):
                hi_rows[j].append(jnp.where(valid, pairs[j][0],
                                            SIG_SENTINEL))
                sig_rows[j].append(jnp.where(valid, pairs[j][1],
                                             SIG_SENTINEL))
        else:
            sigs = sc.compose_pairs(segs)
            for j in range(NUM_LISTS):
                sig_rows[j].append(jnp.where(valid, sigs[j], SIG_SENTINEL))

    poss1 = jnp.concatenate(pos_rows)                      # [16C]
    poss = jnp.broadcast_to(poss1, (NUM_LISTS, 16 * C))
    keys = jnp.stack([jnp.concatenate(r) for r in sig_rows])
    keys_hi = jnp.stack([jnp.concatenate(r) for r in hi_rows]) \
        if sc.wide else None

    # single-key stable sorts: XLA's TPU single-key path measured ~100x
    # faster than the variadic comparator sort. Entry order within an
    # equal signature is free (the matcher re-orders compacted lanes),
    # EXCEPT sentinels must come last — guaranteed value-wise unless a
    # real all-T pair exists (order_sentinels: one extra stable pass on
    # the sentinel flag = the LSD minor digit).
    if order_sentinels:
        flag = (poss == POS_SENTINEL).astype(jnp.uint32)
        if sc.wide:
            _, keys, keys_hi, poss = lax.sort(
                (flag, keys, keys_hi, poss), num_keys=1, dimension=1,
                is_stable=True)
        else:
            _, keys, poss = lax.sort((flag, keys, poss), num_keys=1,
                                     dimension=1, is_stable=True)
    if sc.wide:
        # the (hi, lo) LSD composition REQUIRES stability: the hi sort
        # must preserve lo order among equal hi planes
        slo, khi, sp = lax.sort((keys, keys_hi, poss), num_keys=1,
                                dimension=1, is_stable=True)
        shi, skey, sp = lax.sort((khi, slo, sp), num_keys=1,
                                 dimension=1, is_stable=True)
        h = sc.bucket_key_bits(shi, skey, bucket_bits).astype(jnp.int32)
    else:
        # order within an equal signature is free (the matcher imposes
        # reference merge order on compacted lanes), so the common
        # narrow path uses the UNSTABLE sort — 1.36 s vs 2.06 s at
        # [6, 46.7M] on v5e. Stability is only needed to preserve the
        # sentinel-flag pre-sort's real-before-sentinel order.
        skey, sp = lax.sort((keys, poss), num_keys=1, dimension=1,
                            is_stable=order_sentinels)
        shi = None
        h = (skey >> jnp.uint32(sc.bucket_shift_bits(bucket_bits))) \
            .astype(jnp.int32)

    # bucket-begin tables (getLookupTable.hpp:26-51): one histogram over
    # the top bucket_bits of each list, sentinels excluded, exclusive
    # scan. Sentinel entries are pinned to the top bucket first: the wide
    # sentinel hi plane (0xFFFFFFFF) exceeds the legal plane range so
    # bucket_key can wrap negative, which would break the sorted-indices
    # contract below (their weight is 0 either way).
    nb = 1 << bucket_bits
    h = jnp.where(sp != POS_SENTINEL, h, jnp.int32(nb - 1))
    h = h + (jnp.arange(NUM_LISTS, dtype=jnp.int32) * nb)[:, None]
    w8 = (sp != POS_SENTINEL).astype(jnp.int32)
    counts = jax.ops.segment_sum(w8.reshape(-1), h.reshape(-1),
                                 num_segments=NUM_LISTS * nb,
                                 indices_are_sorted=True)
    counts = counts.reshape(NUM_LISTS, nb)
    bb = jnp.concatenate(
        [jnp.zeros((NUM_LISTS, 1), jnp.int32),
         jnp.cumsum(counts, axis=1, dtype=jnp.int32)], axis=1)
    # FLAT [6*M] / [6*(NB+1)] output layout: the match step indexes the
    # lists with flat 1-D gathers, and a per-step reshape of the tiled
    # [6, M] arrays would lower to a while-loop layout-conversion copy
    # (~6.5 ms per step measured on TPU); converting once at build time
    # amortizes it over every batch of the shard.
    return (shi.reshape(-1) if shi is not None else None,
            skey.reshape(-1), sp.reshape(-1), bb.reshape(-1))


_build_lists = jax.jit(build_lists_impl,
                       static_argnames=("seedl", "num_windows",
                                        "order_sentinels", "bucket_bits"))


def shard_windows(num_windows: int, num_shards: int) -> int:
    """Windows per shard, 16-aligned (so every shard's `start` is a
    multiple of 16 as build_lists_impl requires)."""
    per = -(-num_windows // num_shards)
    return -(-per // 16) * 16


def build_index(text: PackedText, seedl: int,
                start: int = 0,
                num_windows: Optional[int] = None) -> SignatureIndex:
    """Build the index over window positions [start, start+num_windows).

    With defaults this indexes the whole text (single block). Passing a
    sub-range implements the reference's memory-bounded block streaming
    (matchUniqueImplementation.cpp:1253) / our index sharding. `start`
    must be 16-aligned (see shard_windows)."""
    total = max(text.n - seedl + 1, 0)
    if num_windows is None:
        num_windows = total - start
    assert start % 16 == 0, "shard starts must be 16-aligned"
    bucket_bits = pick_bucket_bits(seedl, int(num_windows))
    sig_hi, sig, pos, bb = _build_lists(
        text.words, text.nb16, text.ncum16,
        jnp.int32(start), int(num_windows), seedl, jnp.int32(text.n),
        order_sentinels=text.order_sentinels(seedl),
        bucket_bits=bucket_bits)
    return SignatureIndex(sig=sig, pos=pos, bb=bb, seedl=seedl,
                          bucket_bits=bucket_bits, sig_hi=sig_hi)
