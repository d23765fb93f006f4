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

    @property
    def num_fragments(self) -> int:
        return len(self.ranges) - 1


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
    frag_offsets = np.array([off for _, off in ranges], dtype=np.int32)
    return PackedText(
        words=jnp.asarray(words),
        nbits=jnp.asarray(nbits),
        ncum=jnp.asarray(ncum),
        frag_offsets=jnp.asarray(frag_offsets),
        n=n,
        ranges=list(ranges),
    )


# ---------------------------------------------------------------------------
# device-side helpers (usable inside jit and Pallas-free XLA paths)
# ---------------------------------------------------------------------------

def extract_bases16(words: jnp.ndarray, base_pos: jnp.ndarray) -> jnp.ndarray:
    """Extract 16 bases starting at arbitrary base offset as one uint32
    (MSB-first). TPU equivalent of AutoTextArray::getTextWord
    (AutoTextArray.hpp:122-125): two word gathers + a funnel shift."""
    bitpos = base_pos.astype(jnp.int32) << 1
    idx = bitpos >> 5
    sh = (bitpos & 31).astype(jnp.uint32)
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
