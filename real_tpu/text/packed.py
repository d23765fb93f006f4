"""Packed genome text for the device (TPU equivalent of AutoTextArray).

The genome is a uint32 array in HBM (16 bases per word, MSB-first), with a
packed N-wildcard bitmap plus a per-word cumulative popcount array replacing
the reference's two-level rank dictionary (AutoTextArray.hpp, ERank222B.hpp):
rank queries become one gather + one `lax.population_count`.

Fragment boundaries are an int32 offsets array; the reference's
RangeVector rank (RangeVector.hpp:59-80) becomes `searchsorted`.
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import jax.numpy as jnp
import numpy as np
from jax import lax

from real_tpu import bitpack


@dataclasses.dataclass
class PackedText:
    """Device-resident packed genome of ONE text file."""
    words: jnp.ndarray        # uint32 [W+2], 16 bases/word, zero padded
    nbits: jnp.ndarray        # uint32 [NW+2], wildcard bitmap, 32 bases/word
    ncum: jnp.ndarray         # int32 [NW+3], cumulative popcount of nbits
    frag_offsets: jnp.ndarray # int32 [F+1], fragment starts + terminal n
    n: int                    # number of bases
    ranges: List[Tuple[str, int]]  # host copy incl. ("terminal", n)
    # 16-base-granularity wildcard structures for the PHASE-MAJOR index
    # build (index/build.py): nb16[g] holds the 16 N-bits of bases
    # [16g, 16g+16) in its low half, ncum16[g] = #N in [0, 16g). The
    # 32-bit nbits/ncum pair stays for query-time rank (16-word phase
    # slices would need parity-alternating 32-bit word indices, i.e.
    # gathers; 16-base granularity makes them static slices).
    nb16: jnp.ndarray = None        # uint32 [G+4]
    ncum16: jnp.ndarray = None      # int32 [G+5]
    # True when some window's pair signature can equal the 0xFFFFFFFF
    # sentinel (an all-T segment pair at seedl 32 / 64) — the build then
    # adds a stable pre-sort pass ordering sentinels last (index/build.py)
    allt32: bool = False
    allt64: bool = False
    # True when the text contains any wildcard base: N-free texts skip
    # the per-candidate rank gathers entirely (a static jit arg — 4 of
    # the ~10 phase-2 gathers per survivor lane)
    has_n: bool = True

    @property
    def num_fragments(self) -> int:
        return len(self.ranges) - 1

    def order_sentinels(self, seedl: int) -> bool:
        return self.allt32 if seedl == 32 else (
            self.allt64 if seedl == 64 else False)


def build_packed_text(codes: np.ndarray,
                      ranges: List[Tuple[str, int]]) -> PackedText:
    n = int(codes.shape[0])
    if n >= 2**31:
        raise ValueError(
            "text file larger than 2^31 bases: split into per-fragment "
            "shards (positions are int32, like the reference's u32 "
            "Mask::pos, Mask.hpp:47)")
    words = bitpack.pack_2bit(codes, pad_words=2)
    nbits = bitpack.pack_bitmap(codes > 3, pad_words=2)
    ncum = bitpack.bitmap_cum_popcount(nbits)
    # 16-bit N-groups: split each 32-bit word into (hi, lo) halves
    nw = len(nbits)
    nb16 = np.empty(2 * nw, dtype=np.uint32)
    nb16[0::2] = nbits >> np.uint32(16)
    nb16[1::2] = nbits & np.uint32(0xFFFF)
    ncum16 = np.zeros(2 * nw + 1, dtype=np.int64)
    ncum16[1:] = np.cumsum(np.bitwise_count(nb16))
    frag_offsets = np.array([off for _, off in ranges], dtype=np.int32)
    return PackedText(
        words=jnp.asarray(words),
        nbits=jnp.asarray(nbits),
        ncum=jnp.asarray(ncum),
        frag_offsets=jnp.asarray(frag_offsets),
        n=n,
        ranges=list(ranges),
        nb16=jnp.asarray(nb16),
        ncum16=jnp.asarray(ncum16.astype(np.int32)),
        allt32=_has_all_t_pair(codes, 32),
        allt64=_has_all_t_pair(codes, 64),
        has_n=bool(ncum16[-1] > 0),
    )


def _run_all(x: np.ndarray, w: int) -> np.ndarray:
    """r[i] = x[i] & x[i+1] & ... & x[i+w-1] by dyadic folding (w a power
    of two); len(r) = len(x) - w + 1."""
    step = 1
    while step < w:
        x = x[:-step] & x[step:]
        step *= 2
    return x


def _has_all_t_pair(codes: np.ndarray, seedl: int) -> bool:
    """True when some window's pair signature equals the 0xFFFFFFFF
    sentinel — i.e. a genuine all-T segment pair exists. Only a
    full-width pair reaches the sentinel: seedl == 32 (narrow) or
    seedl == 64 (wide); every other seedl's signatures are narrower than
    32/64 bits, so the sentinel sorts strictly last for free. When True,
    the device build adds a stable pre-sort pass ordering real entries
    before sentinels within the shared key (bucket tables and the
    matcher's real-end range clamp rely on sentinels being last)."""
    w = seedl // 4
    x = codes == 3
    if len(x) < seedl:
        return False
    seg_t = _run_all(x, w)                 # seg_t[i]: codes[i:i+w] all T
    if not seg_t.any():
        return False
    from real_tpu.index.signatures import PAIR_SEGMENTS, SigConfig
    offs = SigConfig(seedl).seg_offsets
    nwin = len(codes) - seedl + 1
    for a, b in PAIR_SEGMENTS:
        sa = seg_t[offs[a]:offs[a] + nwin]
        sb = seg_t[offs[b]:offs[b] + nwin]
        if bool(np.any(sa & sb)):
            return True
    return False


# ---------------------------------------------------------------------------
# device-side helpers (usable inside jit and Pallas-free XLA paths)
# ---------------------------------------------------------------------------

def extract_bases16(words: jnp.ndarray, base_pos: jnp.ndarray) -> jnp.ndarray:
    """Extract 16 bases starting at arbitrary base offset as one uint32
    (MSB-first). TPU equivalent of AutoTextArray::getTextWord
    (AutoTextArray.hpp:122-125): two word gathers + a funnel shift.
    No doubled-position intermediate: pos << 1 overflows int32 past
    2^30 (see matchstep._extract_windows)."""
    p32 = base_pos.astype(jnp.int32)
    idx = p32 >> 4
    sh = ((p32 & 15) << 1).astype(jnp.uint32)
    w0 = jnp.take(words, idx, mode="clip")
    w1 = jnp.take(words, idx + 1, mode="clip")
    hi = w0 << sh
    # (x >> (31-sh)) >> 1 == x >> (32-sh), well-defined for sh == 0
    lo = (w1 >> (jnp.uint32(31) - sh)) >> 1
    return hi | lo


def pair_mismatch_count(x: jnp.ndarray) -> jnp.ndarray:
    """Number of differing 2-bit base pairs in an XOR'd packed word — the
    engine's hottest primitive (PopCountTable.hpp:113-131)."""
    y = ((x >> 1) | x) & jnp.uint32(0x55555555)
    return lax.population_count(y).astype(jnp.int32)


def n_rank_excl(nbits: jnp.ndarray, ncum: jnp.ndarray,
                p: jnp.ndarray) -> jnp.ndarray:
    """Number of wildcard (N) bases in [0, p)."""
    p = p.astype(jnp.int32)
    wi = p >> 5
    bo = (p & 31).astype(jnp.uint32)
    w = jnp.take(nbits, wi, mode="clip")
    partial = lax.population_count((w >> (jnp.uint32(31) - bo)) >> 1)
    return jnp.take(ncum, wi, mode="clip") + partial.astype(jnp.int32)


def is_dontcare_free(nbits: jnp.ndarray, ncum: jnp.ndarray,
                     i: jnp.ndarray, l) -> jnp.ndarray:
    """AutoTextArray::isDontCareFree(i, l) (AutoTextArray.hpp:167-172)."""
    return (n_rank_excl(nbits, ncum, i + l)
            - n_rank_excl(nbits, ncum, i)) == 0
