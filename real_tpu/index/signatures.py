"""Pigeonhole seed-signature algebra.

Reference: SignatureConstruction.hpp. The seed (first `seedl` bases of a
read / each genome window) is split into nu=4 segments m0..m3 with widths
l/4, l/4, l/4, l - 3*(l/4) (m3 absorbs the remainder,
SignatureConstruction.hpp:48). The C(4,2)=6 pairwise concatenations
s0=(m0,m1) .. s5=(m2,m3) (SignatureConstruction.hpp:62-67) are the index /
probe keys: with at most 2 seed mismatches, at least one pair is error-free.

Pairing of lists for verification (ListSet.hpp:41-44, match calls at
matchUniqueImplementation.cpp:416-452): list j's complementary signature is
s[5-j] — the two segments NOT in the probe key; the mismatch count of the
complementary pair is the seed error count.

Signature width: every pair signature has exactly `seedl` bits (seedl is
clamped to a multiple of 4, so all four segments have seedl/4 symbols and
every pair 2 * seedl/4 * 2 = seedl bits). For seedl <= 32 a pair fits one
uint32 lane. For seedl in (32, 64] — the reference's u_int64_t dispatch
(real.cpp:217-221) — signatures are (hi, lo) uint32 plane pairs: TPUs have
no native 64-bit integer lanes, so the wide path carries two uint32 arrays
and compares them lexicographically. SigConfig.wide selects the layout
statically (it is a function of seedl, which is a jit-static argument
everywhere).
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence, Tuple

import numpy as np

NUM_LISTS = 6
# (first segment, second segment) of each pair signature s0..s5
PAIR_SEGMENTS: Tuple[Tuple[int, int], ...] = (
    (0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3))


@dataclasses.dataclass(frozen=True)
class SigConfig:
    seedl: int

    @property
    def syms(self) -> Tuple[int, int, int, int]:
        w = self.seedl // 4
        return (w, w, w, self.seedl - 3 * w)

    @property
    def bits(self) -> Tuple[int, int, int, int]:
        return tuple(2 * s for s in self.syms)

    @property
    def seg_offsets(self) -> Tuple[int, int, int, int]:
        s = self.syms
        return (0, s[0], s[0] + s[1], s[0] + s[1] + s[2])

    def pair_bits(self, j: int) -> int:
        a, b = PAIR_SEGMENTS[j]
        return self.bits[a] + self.bits[b]

    @property
    def wide(self) -> bool:
        """True when pair signatures exceed 32 bits (u64 reference path)."""
        return self.seedl > 32

    @property
    def bucket_bits(self) -> int:
        """Default bucket-table width (the reference's 22 sample bits,
        getSampleBits.hpp:22-25). The build normally OVERRIDES this per
        shard (index.build.pick_bucket_bits) so occupancy stays ~1;
        every consumer must use the width recorded on the built index.
        seedl is a multiple of 4, so all six pairs have the same width
        2*(seedl/2) = seedl bits."""
        return min(22, self.seedl)

    @property
    def bucket_shift(self) -> int:
        return self.seedl - self.bucket_bits

    def bucket_shift_bits(self, bits: int) -> int:
        return self.seedl - min(bits, self.seedl)

    def bucket_key_bits(self, hi, lo, bits: int):
        """Top `bits` bits of a wide (hi, lo) signature:
        full >> (seedl - bits), assembled from the two planes."""
        sh = self.bucket_shift_bits(bits)
        if sh >= 32:
            return hi >> np.uint32(sh - 32)
        if sh == 0:
            return lo
        return (hi << np.uint32(32 - sh)) | (lo >> np.uint32(sh))

    def compose_pairs(self, m: Sequence) -> List:
        """s0..s5 from segments m0..m3 (works for np or jnp uint32 arrays).
        sj = (m_a << bits_b) | m_b (SignatureConstruction.hpp:62-67).
        Narrow (seedl <= 32) only; wide path uses compose_pairs_wide."""
        assert not self.wide
        bits = self.bits
        return [(m[a] << np.uint32(bits[b])) | m[b]
                for a, b in PAIR_SEGMENTS]

    def compose_pairs_wide(self, m: Sequence) -> List:
        """s0..s5 as (hi, lo) uint32 plane pairs for seedl in (32, 64].

        full = (m_a << bits_b) | m_b with bits_a + bits_b = seedl <= 64 and
        each segment <= 32 bits; lo is the low 32 bits, hi the remaining
        seedl-32 high bits."""
        assert self.wide
        bits = self.bits
        out = []
        for a, b in PAIR_SEGMENTS:
            if bits[b] >= 32:                     # seedl == 64: clean split
                out.append((m[a], m[b]))
            else:
                hi = m[a] >> np.uint32(32 - bits[b])
                lo = (m[a] << np.uint32(bits[b])) | m[b]
                out.append((hi, lo))
        return out

    def bucket_key(self, hi, lo):
        """Top bucket_bits bits of a wide (hi, lo) signature:
        full >> (seedl - 22), assembled from the two planes."""
        sh = self.bucket_shift
        if sh >= 32:
            return hi >> np.uint32(sh - 32)
        return (hi << np.uint32(32 - sh)) | (lo >> np.uint32(sh))

    def validate(self) -> None:
        if self.seedl > 64:
            raise ValueError("seedl must be <= 64")
        if self.seedl % 4 or self.seedl < 4:
            raise ValueError("seedl must be a positive multiple of 4")


def read_segments(codes, seedl: int):
    """Extract m0..m3 (uint32) from a [B, L>=seedl] batch of base codes.

    Vectorized equivalent of SignatureConstruction::signatureMapped
    (SignatureConstruction.hpp:219-280). Works for NumPy and jax.numpy.
    Caller must mask out reads containing codes > 3 (the reference returns
    false for them)."""
    sc = SigConfig(seedl)
    sc.validate()
    segs = []
    xnp = np if isinstance(codes, np.ndarray) else _jnp()
    c = codes.astype(xnp.uint32)
    for off, w in zip(sc.seg_offsets, sc.syms):
        shifts = (2 * (w - 1 - np.arange(w))).astype(np.uint32)
        seg = ((c[..., off:off + w] & 3) << shifts).sum(
            axis=-1, dtype=xnp.uint32)
        segs.append(seg)
    return segs


def read_segments_rc(codes, seedl: int):
    """Segments of the reverse-complement of the read's SEED —
    RC(read[0:seedl]), which equals RC(read)[patl-seedl:patl]: for the
    inverted probe the indexed window sits at the END of the reverse
    placement, so pos = rpos - restlen (reverseMappedSignature,
    SignatureConstruction.hpp:348-410; RestMatch::getMatchOffset,
    RestMatch.hpp:84-89). `codes` is the straight read [B, L>=seedl]."""
    xnp = np if isinstance(codes, np.ndarray) else _jnp()
    seed = codes[..., :seedl]
    rc = (xnp.uint32(3) - seed[..., ::-1].astype(xnp.uint32)) & 3
    return read_segments(rc, seedl)


def _jnp():
    import jax.numpy as jnp
    return jnp
