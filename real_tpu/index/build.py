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
import functools
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


def pick_bucket_bits(seedl: int, num_windows: int, reads: int = 0,
                     cap: int = 25) -> int:
    """Bucket-table width for a shard.

    With reads == 0 (or the wide signature path): the occupancy-~1 rule —
    enough bits that the bucket range IS the equal range for almost every
    probe and the matcher needs no in-bucket bisection, capped at 25 (the
    6 tables then cost 6*(2^25+1)*4 B = 805 MB HBM — accounted by
    parallel/plan) and at the signature width. The reference's fixed 22
    sample bits (getSampleBits.hpp:22-25) left chr21-scale buckets 11-deep.

    With reads > 0 (the stream volume that will probe this shard): joint
    cost model over table-construction + matcher-bisection, from r5
    device measurements — the occupancy-1 table costs 2.5 s of
    segment_sum at chr21 scale (~9 ns per list entry, input-bound
    regardless of bucket count), while a narrower table builds via
    vectorized binary search and the matcher's in-bucket bisection
    compensates. Measured (r5, v5e/axon): bisection gathers are
    DEPENDENT (serial steps) and cost ~10 ns each — a chr21 step at
    bits=17/steps=12 was 181 ms vs 93 ms at bits=25/steps=0 — so
    occupancy-1 tables win for every standard config's read volume;
    narrow tables win only for small streams (overflow-rerun subsets
    rebuild a 332-read shard ~2 s faster, and tiny -p files)."""
    import math
    bits = max(num_windows - 1, 1).bit_length()
    # the 12-bit floor must not exceed the signature width (= seedl bits):
    # for legal seedl 4/8 a floored width would make seedl - bucket_bits
    # negative (an illegal uint32 shift in the narrow device build).
    # cap defaults to 25 (two resident tables, 805 MB each at the cap);
    # the streaming XXL-shard plan raises it (parallel/plan.py
    # plan_index_shards_streaming) so doubled shards stay bisection-free
    occ1 = min(max(12, min(bits, cap)), seedl)
    if reads <= 0 or seedl > 32:
        return occ1
    M = max(num_windows, 2)
    logm = math.ceil(math.log2(M + 1))
    G = 10e-9             # dependent bisect gather (measured ~10 ns)
    SEG = 9e-9            # segment_sum per list entry (measured 2.5s/280M)

    def table_cost(b: int) -> float:
        return min(6 * M * SEG, 6 * (1 << b) * logm * G)

    def match_cost(b: int) -> float:
        occ = M / float(1 << b)
        if occ <= 2.0:                      # lane path, no bisection
            return reads * 12 * 4 * G
        steps = math.ceil(math.log2(8.0 * occ + 1))
        steps = -(-steps // 4) * 4          # driver rounds to multiple of 4
        return reads * 12 * 2 * steps * G

    hi_b = min(max(12, min(bits, cap)), seedl)
    lo_b = min(12, hi_b)
    best = min(range(lo_b, hi_b + 1),
               key=lambda b: (table_cost(b) + match_cost(b), -b))
    return best


def _rank_table_bisect(skey: jnp.ndarray, real_n: jnp.ndarray,
                       bucket_bits: int, shift_bits: int) -> jnp.ndarray:
    """Dense bucket-begin tables from the sorted lists, WITHOUT the
    scatter: bb[j, b] = #{i < real_n : skey[j, i] < (b << shift)} by an
    unrolled vectorized binary search over [6, 2^bits] boundary queries.

    Replaces jax.ops.segment_sum for narrow tables: the scatter-add costs
    ~9 ns per list entry on TPU regardless of bucket count (2.5 s at
    chr21 scale), while this is 6*2^bits*log2(M) flat gathers. Exactness:
    a real key with bucket value v satisfies key < b<<shift iff v < b,
    so the counts equal the segment-sum histogram's exclusive prefix
    sums; sentinel entries (sig 0xFFFFFFFF) sort after every real entry
    and are excluded by the real_n upper bound."""
    NL, M = skey.shape
    return _rank_table_core(skey.reshape(-1), real_n, M,
                            bucket_bits, shift_bits)


def _rank_table_core(flat: jnp.ndarray, real_n: jnp.ndarray, M: int,
                     bucket_bits: int, shift_bits: int) -> jnp.ndarray:
    NL = NUM_LISTS
    nb = 1 << bucket_bits
    base = (jnp.arange(NL, dtype=jnp.int32) * M)[:, None]
    b = jnp.arange(1, nb + 1, dtype=jnp.uint32)
    # boundary-1 in wrapping u32: for b<<shift == 2^32 this yields
    # 0xFFFFFFFF (count everything real) — exactly right
    bm1 = ((b << jnp.uint32(shift_bits)) - jnp.uint32(1))[None, :]
    lo = jnp.zeros((NL, nb), jnp.int32)
    hi = jnp.broadcast_to(real_n.astype(jnp.int32), (NL, nb))
    steps = max(int(M).bit_length(), 1)
    for _ in range(steps):
        live = lo < hi
        mid = (lo + hi) >> 1
        v = jnp.take(flat, jnp.minimum(mid, M - 1) + base)
        go = (v <= bm1) & live
        lo = jnp.where(go, mid + 1, lo)
        hi = jnp.where(~go & live, mid, hi)
    return jnp.concatenate([jnp.zeros((NL, 1), jnp.int32), lo], axis=1)


def _use_bisect_table(bucket_bits: int, num_windows: int,
                      wide: bool) -> bool:
    """Static choice between the segment-sum histogram and the bisected
    rank table (same result; see _rank_table_bisect). The bisect build
    costs ~2^bits*log2(M) gathers vs the scatter's ~9 ns * M; wide
    signatures keep the scatter path (64-bit boundary compares)."""
    if wide:
        return False
    import math
    logm = math.ceil(math.log2(max(num_windows, 2) + 1))
    return (1 << bucket_bits) * logm * 3 < num_windows * 9


def _phase_words(words: jnp.ndarray, word_lo, nk: int, extra: int):
    """PW[p, k] = 16-base word at base position 16*(word_lo + k) + p —
    ONE broadcasted funnel shift producing the whole [16, L] matrix
    (the earlier per-phase Python loop emitted ~100 small slice/concat
    ops that cost 2 s of the 4 s chr21 build)."""
    L = nk + extra
    words = jnp.concatenate([words, jnp.zeros(L + 2, words.dtype)])
    w = lax.dynamic_slice(words, (word_lo,), (L + 1,))
    w0, w1 = w[:-1][None, :], w[1:][None, :]
    sh = (2 * jnp.arange(16, dtype=jnp.uint32))[:, None]
    return (w0 << sh) | (((w1 >> (jnp.uint32(31) - sh)) >> 1))


def build_lists_impl(words: jnp.ndarray, nb16: jnp.ndarray,
                     ncum16: jnp.ndarray,
                     start: jnp.ndarray, num_windows: int, seedl: int,
                     n: jnp.ndarray, *, order_sentinels: bool = False,
                     bucket_bits: int = 0, skip_table: bool = False):
    """Build sorted lists + bucket tables covering windows
    [start, start + 16*ceil(num_windows/16)). `start` must be a multiple
    of 16. Positions past min(start + num_windows, n - seedl) - 1 become
    sentinels. Returns (sig_hi | None, sig, pos, bb) FLAT arrays with
    M = 16*ceil(num_windows/16) entries per list.

    skip_table=True returns the real-entry count (valid windows) in
    place of bb: build_index then constructs the table with the
    SEPARATELY-jitted _rank_table_bisect — fusing the bisection into
    this graph wedged XLA CPU compilation indefinitely (r5)."""
    sc = SigConfig(seedl)
    bucket_bits = bucket_bits or pick_bucket_bits(seedl, num_windows)
    word_lo = start.astype(jnp.int32) >> 4
    C = -(-num_windows // 16)            # k-extent per phase
    # extra words beyond C: max segment start offset 3*(seedl//4) <= 48
    # plus the validity group offset (seedl//16 + 1) and funnel spill
    extra = (15 + 3 * (seedl // 4)) // 16 + seedl // 16 + 3
    pw = _phase_words(words, word_lo, C, extra)     # [16, C + extra]

    # wildcard counts at 16-base granularity, phase-sliced
    GL = C + seedl // 16 + 3
    nb16p = jnp.concatenate([nb16, jnp.zeros(GL + 2, nb16.dtype)])
    nb16s = lax.dynamic_slice(nb16p, (word_lo,), (GL,))
    ncum16p = jnp.concatenate([ncum16, jnp.full(GL + 2, ncum16[-1],
                                                ncum16.dtype)])
    ncum16s = lax.dynamic_slice(ncum16p, (word_lo,), (GL,))

    # ALL-PHASE tensors [16, C]: row p covers window positions
    # start + 16k + p. A row of the [16, ...] matrices for offset `off`
    # comes from source row (p + off) % 16 at column offset (p + off)//16
    # — two static row-block slices + one concat per offset, instead of
    # 16 per-phase slices (the per-phase build's ~100 small ops cost 2 s
    # of the 4 s chr21-scale build; this form is a handful of [16, C]
    # vector ops).
    def rows_at(mat2d, off: int) -> jnp.ndarray:
        q, D = off % 16, off // 16
        top = mat2d[q:, D:D + C]
        if q == 0:
            return top
        return jnp.concatenate([top, mat2d[:q, D + 1:D + 1 + C]], axis=0)

    def npre_all(off_base: int) -> jnp.ndarray:
        """[16, C] N-count before base position 16k + p + off_base."""
        q, D = off_base % 16, off_base // 16
        p2 = (jnp.arange(16, dtype=jnp.uint32) + q) % 16    # per-row phase
        d_extra = ((jnp.arange(16) + q) // 16)[:, None]     # 0 or 1
        b = jnp.where(d_extra == 0, nb16s[D:D + C][None, :],
                      nb16s[D + 1:D + 1 + C][None, :])
        cum = jnp.where(d_extra == 0, ncum16s[D:D + C][None, :],
                        ncum16s[D + 1:D + 1 + C][None, :])
        part = lax.population_count(
            b >> (jnp.uint32(16) - p2[:, None])).astype(jnp.int32)
        return cum + jnp.where((p2 == 0)[:, None], 0, part)

    segs = [rows_at(pw, off) >> jnp.uint32(2 * (16 - w))
            for off, w in zip(sc.seg_offsets, sc.syms)]     # 4 x [16, C]

    pos2d = (start + 16 * jnp.arange(C, dtype=jnp.int32)[None, :]
             + jnp.arange(16, dtype=jnp.int32)[:, None])    # [16, C]
    valid = (pos2d <= (n - seedl)) & (pos2d < start + num_windows) \
        & ((npre_all(seedl) - npre_all(0)) == 0)

    poss1 = jnp.where(valid, pos2d, POS_SENTINEL).reshape(16 * C)
    poss = jnp.broadcast_to(poss1, (NUM_LISTS, 16 * C))
    if sc.wide:
        pairs = sc.compose_pairs_wide(segs)
        keys = jnp.stack([jnp.where(valid, p[1], SIG_SENTINEL)
                          .reshape(16 * C) for p in pairs])
        keys_hi = jnp.stack([jnp.where(valid, p[0], SIG_SENTINEL)
                             .reshape(16 * C) for p in pairs])
    else:
        sigs = sc.compose_pairs(segs)
        keys = jnp.stack([jnp.where(valid, s, SIG_SENTINEL)
                          .reshape(16 * C) for s in sigs])
        keys_hi = None

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
    else:
        # order within an equal signature is free (the matcher imposes
        # reference merge order on compacted lanes), so the common
        # narrow path uses the UNSTABLE sort — 1.36 s vs 2.06 s at
        # [6, 46.7M] on v5e. Stability is only needed to preserve the
        # sentinel-flag pre-sort's real-before-sentinel order.
        skey, sp = lax.sort((keys, poss), num_keys=1, dimension=1,
                            is_stable=order_sentinels)
        shi = None

    # bucket-begin tables (getLookupTable.hpp:26-51): the segment-sum
    # histogram, or (skip_table) deferred to the separate
    # _rank_table_bisect jit for narrow tables.
    nb = 1 << bucket_bits
    if skip_table:
        bb = valid.sum(dtype=jnp.int32)         # sentinels sort last
    else:
        if sc.wide:
            h = sc.bucket_key_bits(shi, skey, bucket_bits).astype(jnp.int32)
        else:
            h = (skey >> jnp.uint32(sc.bucket_shift_bits(bucket_bits))) \
                .astype(jnp.int32)
        # sentinels are pinned to the top bucket first: the wide sentinel
        # hi plane (0xFFFFFFFF) exceeds the legal plane range so
        # bucket_key can wrap negative, which would break the
        # sorted-indices contract (their weight is 0 either way)
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
            skey.reshape(-1), sp.reshape(-1),
            bb if skip_table else bb.reshape(-1))


_build_lists = jax.jit(build_lists_impl,
                       static_argnames=("seedl", "num_windows",
                                        "order_sentinels", "bucket_bits",
                                        "skip_table"))


@functools.partial(jax.jit,
                   static_argnames=("bucket_bits", "shift_bits"))
def _rank_table_2d(skey_flat, real_n, *, bucket_bits: int,
                   shift_bits: int):
    M = skey_flat.shape[0] // NUM_LISTS
    return _rank_table_core(skey_flat, real_n, M, bucket_bits, shift_bits)


def _rank_table_flat(skey_flat, real_n, *, bucket_bits: int,
                     shift_bits: int):
    """Flat-layout wrapper: [6*M] sorted keys -> [6*(2^bits+1)] table.

    The [6, nb+1] -> flat reshape happens OUTSIDE the jit: an in-graph
    output reshape after the unrolled bisection wedged XLA CPU
    compilation indefinitely (r5; without it the same graph compiles in
    <1 s)."""
    return _rank_table_2d(skey_flat, real_n, bucket_bits=bucket_bits,
                          shift_bits=shift_bits).reshape(-1)


def shard_windows(num_windows: int, num_shards: int) -> int:
    """Windows per shard, 16-aligned (so every shard's `start` is a
    multiple of 16 as build_lists_impl requires)."""
    per = -(-num_windows // num_shards)
    return -(-per // 16) * 16


def build_index(text: PackedText, seedl: int,
                start: int = 0,
                num_windows: Optional[int] = None,
                bucket_bits: int = 0) -> SignatureIndex:
    """Build the index over window positions [start, start+num_windows).

    With defaults this indexes the whole text (single block). Passing a
    sub-range implements the reference's memory-bounded block streaming
    (matchUniqueImplementation.cpp:1253) / our index sharding. `start`
    must be 16-aligned (see shard_windows). bucket_bits overrides the
    table width (driver passes the reads-aware pick_bucket_bits)."""
    total = max(text.n - seedl + 1, 0)
    if num_windows is None:
        num_windows = total - start
    assert start % 16 == 0, "shard starts must be 16-aligned"
    bucket_bits = bucket_bits or pick_bucket_bits(seedl, int(num_windows))
    sc = SigConfig(seedl)
    skip = _use_bisect_table(bucket_bits, int(num_windows), sc.wide)
    sig_hi, sig, pos, bb = _build_lists(
        text.words, text.nb16, text.ncum16,
        jnp.int32(start), int(num_windows), seedl, jnp.int32(text.n),
        order_sentinels=text.order_sentinels(seedl),
        bucket_bits=bucket_bits, skip_table=skip)
    if skip:
        # narrow tables: bisected rank table as a SEPARATE jit (bb here
        # is the real-entry count) — see build_lists_impl docstring
        bb = _rank_table_flat(sig, bb,
                              bucket_bits=bucket_bits,
                              shift_bits=sc.bucket_shift_bits(bucket_bits))
    return SignatureIndex(sig=sig, pos=pos, bb=bb, seedl=seedl,
                          bucket_bits=bucket_bits, sig_hi=sig_hi)
