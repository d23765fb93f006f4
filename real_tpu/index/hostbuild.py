"""Host-side (NumPy) index construction.

Same output as index.build (six sorted (sig, pos) lists) computed with
vectorized NumPy. Mirrors the device build — phase-blocked entry order,
16-rounded list length, per-shard bucket width, and the sentinel
ordering pass. Wide (seedl > 32) builds are EXACTLY equal array-wise
(both sides sort stably); narrow builds may permute entries within an
equal signature run (the device uses the faster unstable sort there —
order within an equal run cannot affect results, engine/matchstep.py
imposes merge order on compacted lanes).

The reference's equivalent is MapTextFile::readLists + OpenMP radix sort
(MapTextFile.hpp:181-230, ParallelRadixSort.hpp).
"""

from __future__ import annotations

import numpy as np

from real_tpu.index.signatures import NUM_LISTS, SigConfig

POS_SENTINEL = np.int32(0x7FFFFFFF)
SIG_SENTINEL = np.uint32(0xFFFFFFFF)


def _extract_bases16_np(words: np.ndarray, base_pos: np.ndarray) -> np.ndarray:
    bitpos = base_pos.astype(np.int64) << 1
    idx = bitpos >> 5
    sh = (bitpos & 31).astype(np.uint32)
    w0 = words[idx]
    w1 = words[np.minimum(idx + 1, len(words) - 1)]
    hi = (w0 << sh).astype(np.uint32)
    lo = ((w1 >> (np.uint32(31) - sh)) >> 1).astype(np.uint32)
    return hi | lo


def _n_rank_excl_np(nbits: np.ndarray, ncum: np.ndarray,
                    p: np.ndarray) -> np.ndarray:
    wi = (p >> 5).astype(np.int64)
    bo = (p & 31).astype(np.uint32)
    w = nbits[np.minimum(wi, len(nbits) - 1)]
    partial = np.bitwise_count((w >> (np.uint32(31) - bo)) >> 1)
    return ncum[np.minimum(wi, len(ncum) - 1)] + partial.astype(np.int32)


def _round16(x: int) -> int:
    """Round up to a multiple of 16 (shard starts must be 16-aligned for
    the device build's phase-sliced extraction, index/build.py)."""
    return -(-x // 16) * 16


def _phase_blocked(a: np.ndarray, C: int) -> np.ndarray:
    """Reorder a [16*C] window-position-ordered array into the device
    build's phase-blocked order: entry p*C + k holds window 16k + p."""
    return a.reshape(C, 16).T.reshape(-1)


def build_lists_host(words: np.ndarray, nbits: np.ndarray, ncum: np.ndarray,
                     n: int, seedl: int, start: int = 0,
                     num_windows: int | None = None,
                     order_sentinels: bool = False,
                     bucket_bits: int = 0):
    """Returns (sig_hi | None, sig, pos, bb) arrays: [6, M] lists
    (M = 16*ceil(num_windows/16), phase-blocked pre-sort order) +
    [6, NB+1] bucket-begin tables (getLookupTable.hpp:26-51)."""
    from real_tpu.index.build import pick_bucket_bits
    sc = SigConfig(seedl)
    sc.validate()
    total = max(n - seedl + 1, 0)
    if num_windows is None:
        num_windows = total - start
    bucket_bits = bucket_bits or pick_bucket_bits(seedl, int(num_windows))
    C = -(-num_windows // 16)
    M = 16 * C
    pos = start + np.arange(M, dtype=np.int64)

    segs = []
    for off, w in zip(sc.seg_offsets, sc.syms):
        v = _extract_bases16_np(words, np.minimum(pos + off,
                                                  16 * len(words) - 17))
        segs.append((v >> np.uint32(2 * (16 - w))).astype(np.uint32))

    valid = (pos <= (n - seedl)) & (pos < start + num_windows)
    valid &= (_n_rank_excl_np(nbits, ncum, np.minimum(pos + seedl, n))
              - _n_rank_excl_np(nbits, ncum, np.minimum(pos, n))) == 0
    pos32 = _phase_blocked(
        np.where(valid, pos, POS_SENTINEL).astype(np.int32), C)
    flag = pos32 == POS_SENTINEL

    hi_out = np.empty((NUM_LISTS, M), np.uint32) if sc.wide else None
    sig_out = np.empty((NUM_LISTS, M), np.uint32)
    pos_out = np.empty((NUM_LISTS, M), np.int32)
    if sc.wide:
        pairs = sc.compose_pairs_wide(segs)
        for j in range(NUM_LISTS):
            key_hi = _phase_blocked(
                np.where(valid, pairs[j][0], SIG_SENTINEL), C)
            key_lo = _phase_blocked(
                np.where(valid, pairs[j][1], SIG_SENTINEL), C)
            # device order: (hi, lo[, flag]) major->minor, then
            # phase-blocked input order (all sorts stable)
            ks = (flag, key_lo, key_hi) if order_sentinels \
                else (key_lo, key_hi)
            order = np.lexsort(ks)
            hi_out[j] = key_hi[order]
            sig_out[j] = key_lo[order]
            pos_out[j] = pos32[order]
    else:
        sigs = sc.compose_pairs(segs)
        for j in range(NUM_LISTS):
            key = _phase_blocked(np.where(valid, sigs[j], SIG_SENTINEL), C)
            ks = (flag, key) if order_sentinels else (key,)
            order = np.lexsort(ks)
            sig_out[j] = key[order]
            pos_out[j] = pos32[order]

    nb = 1 << bucket_bits
    bb = np.zeros((NUM_LISTS, nb + 1), np.int32)
    sh = sc.bucket_shift_bits(bucket_bits)
    for j in range(NUM_LISTS):
        live = pos_out[j] != POS_SENTINEL
        if sc.wide:
            h = sc.bucket_key_bits(hi_out[j][live], sig_out[j][live],
                                   bucket_bits).astype(np.int64)
        else:
            h = (sig_out[j][live] >> np.uint32(sh)).astype(np.int64)
        bb[j, 1:] = np.cumsum(np.bincount(h, minlength=nb)).astype(np.int32)
    return hi_out, sig_out, pos_out, bb


def build_index_host(text, seedl: int, start: int = 0,
                     num_windows: int | None = None):
    """Host-built SignatureIndex with device-resident arrays."""
    import jax.numpy as jnp

    from real_tpu.index.build import SignatureIndex, pick_bucket_bits

    words = np.asarray(text.words)
    nbits = np.asarray(text.nbits)
    ncum = np.asarray(text.ncum)
    total = max(text.n - seedl + 1, 0)
    nw = int(num_windows if num_windows is not None else total - start)
    bucket_bits = pick_bucket_bits(seedl, nw)
    sig_hi, sig, pos, bb = build_lists_host(
        words, nbits, ncum, text.n, seedl, start, nw,
        order_sentinels=text.order_sentinels(seedl),
        bucket_bits=bucket_bits)
    # flat [6*M] layout, matching the device build (see index/build.py)
    return SignatureIndex(sig=jnp.asarray(sig.reshape(-1)),
                          pos=jnp.asarray(pos.reshape(-1)),
                          bb=jnp.asarray(bb.reshape(-1)),
                          seedl=seedl, bucket_bits=bucket_bits,
                          sig_hi=None if sig_hi is None
                          else jnp.asarray(sig_hi.reshape(-1)))
