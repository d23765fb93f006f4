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

Because window positions are consecutive, segment extraction needs NO
gathers: the 16-base word at every position is computed with a 16-phase
funnel-shift over the packed words (each phase is a strided slice), and the
N-free test is a cumulative-sum prefix over the unpacked wildcard bitmap —
all dense vector passes. Random-access gathers appear only at query time.

A per-list bucket table over the top `bucket_bits` signature bits
(getLookupTable.hpp:26-51, getSampleBits.hpp: 22 sample bits) turns the
probe's equal-range search into one gather: bucket_begin[h] is the first
list slot of bucket h, and an equal range never crosses a bucket (equal
signatures share all bits), so candidates are read from bucket_begin[h]
and filtered by stored-signature equality; `count > K` flags escalation.

Invalid windows (containing N / block padding) get signature 0xFFFFFFFF and
position sentinel 0x7FFFFFFF so they sort to the tail of each list, are
excluded from bucket counts, and are rejected by the position mask in the
matcher.
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
    # high uint32 plane of 64-bit signatures (seedl > 32, the reference's
    # u_int64_t dispatch real.cpp:217-221); None for seedl <= 32
    sig_hi: Optional[jnp.ndarray] = None


def _ext16_all(words: jnp.ndarray, word_lo, n_ext: int) -> jnp.ndarray:
    """16-base words at EVERY base position [16*word_lo, 16*word_lo+n_ext)
    without gathers: 16 funnel-shift phases over static slices."""
    nw = -(-n_ext // 16) + 1
    # pad so the slice never clamps (dynamic_slice shifts the window on
    # out-of-bounds starts, which would corrupt the tail shard)
    words = jnp.concatenate([words, jnp.zeros(nw, words.dtype)])
    w = lax.dynamic_slice(words, (word_lo,), (nw,))
    w0 = w[:-1]
    w1 = w[1:]
    phases = []
    for p in range(16):
        sh = jnp.uint32(2 * p)
        hi = w0 << sh
        lo = (w1 >> (jnp.uint32(31) - sh)) >> 1
        phases.append(hi | lo)
    # phases[p][k] = word at base position 16k + p  ->  interleave
    return jnp.stack(phases, axis=1).reshape(-1)[:n_ext]


def _n_prefix(nbits: jnp.ndarray, word_lo, n_ext: int) -> jnp.ndarray:
    """#wildcards in [16*word_lo, 16*word_lo + i) for i in 0..n_ext —
    dense unpack + cumsum replacing per-window rank gathers."""
    # nbits packs 32 bases per word; align to the 16-base word grid
    nw32 = -(-(n_ext + 16) // 32) + 1
    nbits = jnp.concatenate([nbits, jnp.zeros(nw32, nbits.dtype)])
    w = lax.dynamic_slice(nbits, (word_lo // 2,), (nw32,))
    shifts = jnp.arange(31, -1, -1, dtype=jnp.uint32)
    bits = ((w[:, None] >> shifts[None, :]) & 1).astype(jnp.int32) \
        .reshape(-1)
    off = (word_lo % 2) * 16            # traced: dynamic_slice, not []
    bits = lax.dynamic_slice(bits, (off,), (n_ext,))
    return jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(bits, dtype=jnp.int32)])


def build_lists_impl(words: jnp.ndarray, nbits: jnp.ndarray,
                     ncum: jnp.ndarray,
                     start: jnp.ndarray, num_windows: int, seedl: int,
                     n: jnp.ndarray):
    """Build sorted lists + bucket tables for windows
    [start, start+num_windows). `start` must be a multiple of 16."""
    sc = SigConfig(seedl)
    word_lo = start.astype(jnp.int32) >> 4
    n_ext = num_windows + seedl          # cover the last window's segments
    ext = _ext16_all(words, word_lo, n_ext)

    segs = []
    for off, w in zip(sc.seg_offsets, sc.syms):
        segs.append(ext[off:off + num_windows] >> jnp.uint32(2 * (16 - w)))

    pos = start + jnp.arange(num_windows, dtype=jnp.int32)
    in_range = pos <= (n - seedl)
    npre = _n_prefix(nbits, word_lo, n_ext)
    valid = in_range & ((npre[seedl:seedl + num_windows]
                         - npre[:num_windows]) == 0)
    spos = jnp.where(valid, pos, POS_SENTINEL)
    poss = jnp.broadcast_to(spos, (NUM_LISTS, num_windows))

    # one batched SINGLE-KEY STABLE sort over all six lists ([6, M] rows).
    # The position payload is already ascending within each row, so a
    # stable sort on the signature alone IS the (sig, pos) lexicographic
    # order the reference's stable radix sort produces — and XLA's TPU
    # single-key sort path measured ~100x faster than the variadic
    # num_keys=2 comparator sort (0.005s vs 0.5s at [6, 4.6M]).
    nb = 1 << sc.bucket_bits
    if sc.wide:
        pairs = sc.compose_pairs_wide(segs)      # list of ([M], [M]) planes
        keys_hi = jnp.stack([jnp.where(valid, pairs[j][0], SIG_SENTINEL)
                             for j in range(NUM_LISTS)])
        keys_lo = jnp.stack([jnp.where(valid, pairs[j][1], SIG_SENTINEL)
                             for j in range(NUM_LISTS)])
        # (hi, lo) lex order via two chained stable single-key sorts
        # (LSD: sort by lo, then stably by hi)
        slo, khi, sp = lax.sort((keys_lo, keys_hi, poss), num_keys=1,
                                dimension=1, is_stable=True)
        shi, skey, sp = lax.sort((khi, slo, sp), num_keys=1,
                                 dimension=1, is_stable=True)
        h = sc.bucket_key(shi, skey).astype(jnp.int32)
    else:
        sigs = sc.compose_pairs(segs)            # list of [M] uint32
        keys = jnp.stack([jnp.where(valid, sigs[j], SIG_SENTINEL)
                          for j in range(NUM_LISTS)])
        skey, sp = lax.sort((keys, poss), num_keys=1, dimension=1,
                            is_stable=True)
        shi = None
        h = (skey >> jnp.uint32(sc.bucket_shift)).astype(jnp.int32)

    # bucket-begin tables (getLookupTable.hpp:26-51): one histogram over
    # the top bucket_bits of each list, sentinels excluded, exclusive
    # scan. Sentinel entries are pinned to the top bucket first: the wide
    # sentinel hi plane (0xFFFFFFFF) exceeds the legal plane range so
    # bucket_key can wrap negative, which would break the sorted-indices
    # contract below (their weight is 0 either way).
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
                       static_argnames=("seedl", "num_windows"))


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
    sig_hi, sig, pos, bb = _build_lists(
        text.words, text.nbits, text.ncum,
        jnp.int32(start), int(num_windows), seedl, jnp.int32(text.n))
    return SignatureIndex(sig=sig, pos=pos, bb=bb, seedl=seedl,
                          sig_hi=sig_hi)
