"""Host-side (NumPy) index construction.

Same output as index.build (six sorted (sig, pos) lists) computed with
vectorized NumPy and one uint64 composite-key argsort per list. Used for
single-host runs: device HBM then only holds the finished sorted lists, and
cold-start avoids a large one-time XLA compile of the build program (the
sorted index is a pure data artifact — where it was sorted cannot change
results, and tests assert host == device build).

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


def build_lists_host(words: np.ndarray, nbits: np.ndarray, ncum: np.ndarray,
                     n: int, seedl: int, start: int = 0,
                     num_windows: int | None = None):
    """Returns (sig, pos, bb) arrays: [6, M] lists + [6, NB+1]
    bucket-begin tables (getLookupTable.hpp:26-51)."""
    sc = SigConfig(seedl)
    sc.validate()
    total = max(n - seedl + 1, 0)
    if num_windows is None:
        num_windows = total - start
    pos = start + np.arange(num_windows, dtype=np.int64)

    segs = []
    for off, w in zip(sc.seg_offsets, sc.syms):
        v = _extract_bases16_np(words, pos + off)
        segs.append((v >> np.uint32(2 * (16 - w))).astype(np.uint32))

    valid = pos <= (n - seedl)
    valid &= (_n_rank_excl_np(nbits, ncum, pos + seedl)
              - _n_rank_excl_np(nbits, ncum, pos)) == 0
    pos32 = np.where(valid, pos, POS_SENTINEL).astype(np.int32)

    hi_out = np.empty((NUM_LISTS, num_windows), np.uint32) if sc.wide \
        else None
    sig_out = np.empty((NUM_LISTS, num_windows), np.uint32)
    pos_out = np.empty((NUM_LISTS, num_windows), np.int32)
    if sc.wide:
        pairs = sc.compose_pairs_wide(segs)
        for j in range(NUM_LISTS):
            key_hi = np.where(valid, pairs[j][0], SIG_SENTINEL)
            key_lo = np.where(valid, pairs[j][1], SIG_SENTINEL)
            # lexsort: last key is primary -> (hi, lo, pos) ascending,
            # stable ascending position within equal signatures
            order = np.lexsort((pos32, key_lo, key_hi))
            hi_out[j] = key_hi[order]
            sig_out[j] = key_lo[order]
            pos_out[j] = pos32[order]
    else:
        sigs = sc.compose_pairs(segs)
        for j in range(NUM_LISTS):
            key = np.where(valid, sigs[j], SIG_SENTINEL)
            # composite key (sig << 31 | pos) -> one u64 argsort per list,
            # stable ascending position within equal signatures like the
            # reference's stable radix sort (ParallelRadixSort.hpp)
            composite = (key.astype(np.uint64) << np.uint64(31)) \
                | pos32.astype(np.uint64)
            order = np.argsort(composite, kind="stable")
            sig_out[j] = key[order]
            pos_out[j] = pos32[order]

    nb = 1 << sc.bucket_bits
    bb = np.zeros((NUM_LISTS, nb + 1), np.int32)
    for j in range(NUM_LISTS):
        live = pos_out[j] != POS_SENTINEL
        if sc.wide:
            h = sc.bucket_key(hi_out[j][live], sig_out[j][live]) \
                .astype(np.int64)
        else:
            h = (sig_out[j][live] >> np.uint32(sc.bucket_shift)) \
                .astype(np.int64)
        bb[j, 1:] = np.cumsum(np.bincount(h, minlength=nb)).astype(np.int32)
    return hi_out, sig_out, pos_out, bb


def build_index_host(text, seedl: int, start: int = 0,
                     num_windows: int | None = None):
    """Host-built SignatureIndex with device-resident arrays."""
    import jax.numpy as jnp

    from real_tpu.index.build import SignatureIndex

    words = np.asarray(text.words)
    nbits = np.asarray(text.nbits)
    ncum = np.asarray(text.ncum)
    sig_hi, sig, pos, bb = build_lists_host(words, nbits, ncum, text.n,
                                            seedl, start, num_windows)
    # flat [6*M] layout, matching the device build (see index/build.py)
    return SignatureIndex(sig=jnp.asarray(sig.reshape(-1)),
                          pos=jnp.asarray(pos.reshape(-1)),
                          bb=jnp.asarray(bb.reshape(-1)),
                          seedl=seedl,
                          sig_hi=None if sig_hi is None
                          else jnp.asarray(sig_hi.reshape(-1)))
