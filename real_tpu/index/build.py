"""Device-side index construction.

TPU-first replacement for the reference's incremental text scan + OpenMP
radix sort (MapTextFile.hpp:181-230, ListSet.hpp:41-63,
ParallelRadixSort.hpp): one vectorized pass computes all windows' four
segments with gathers + funnel shifts, composes the six pair signatures,
and `lax.sort` produces the six sorted lists. Each list row carries
(signature, complementary-pair signature, position) — the explicit
complement replaces the reference's ptr cross-links (u_sort.hpp:29-40,
Mask.hpp:36-40): a probe hit verifies its seed errors directly against the
stored complementary signature.

Invalid windows (containing N / block padding) get signature 0xFFFFFFFF and
position sentinel 0x7FFFFFFF so they sort to the tail of each equal-range
and are rejected by the position mask in the matcher.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from real_tpu.index.signatures import NUM_LISTS, SigConfig
from real_tpu.text.packed import PackedText, extract_bases16, is_dontcare_free

POS_SENTINEL = jnp.int32(0x7FFFFFFF)
SIG_SENTINEL = jnp.uint32(0xFFFFFFFF)


@dataclasses.dataclass
class SignatureIndex:
    """Six sorted pair-signature lists over one text block/shard."""
    sig: jnp.ndarray    # uint32 [6, M] sorted (primary key)
    comp: jnp.ndarray   # uint32 [6, M] complementary pair signature
    pos: jnp.ndarray    # int32  [6, M] window position (sentinel if invalid)
    seedl: int


def build_lists_impl(words: jnp.ndarray, nbits: jnp.ndarray,
                     ncum: jnp.ndarray,
                     start: jnp.ndarray, num_windows: int, seedl: int,
                     n: jnp.ndarray):
    """Build sorted lists for windows [start, start+num_windows)."""
    sc = SigConfig(seedl)
    pos = start + jnp.arange(num_windows, dtype=jnp.int32)
    in_range = pos <= (n - seedl)

    segs = []
    for off, w in zip(sc.seg_offsets, sc.syms):
        v = extract_bases16(words, pos + off)          # 16 bases MSB-first
        segs.append(v >> jnp.uint32(2 * (16 - w)))      # top w bases
    sigs = sc.compose_pairs(segs)                       # list of [M] uint32

    valid = in_range & is_dontcare_free(nbits, ncum, pos, seedl)
    spos = jnp.where(valid, pos, POS_SENTINEL)

    # one batched variadic sort over all six lists ([6, M] rows) — a single
    # XLA sort op keeps (remote) compile time flat vs six separate sorts
    keys = jnp.stack([jnp.where(valid, sigs[j], SIG_SENTINEL)
                      for j in range(NUM_LISTS)])
    comps = jnp.stack([sigs[NUM_LISTS - 1 - j] for j in range(NUM_LISTS)])
    poss = jnp.broadcast_to(spos, (NUM_LISTS, num_windows))
    # stable ascending (sig, pos): reference lists are stable radix sorted,
    # so equal signatures keep ascending text position
    skey, sp, scomp = lax.sort((keys, poss, comps), num_keys=2,
                               dimension=1)
    return skey, scomp, sp


_build_lists = jax.jit(build_lists_impl,
                       static_argnames=("seedl", "num_windows"))


def build_index(text: PackedText, seedl: int,
                start: int = 0,
                num_windows: Optional[int] = None) -> SignatureIndex:
    """Build the index over window positions [start, start+num_windows).

    With defaults this indexes the whole text (single block). Passing a
    sub-range implements the reference's memory-bounded block streaming
    (matchUniqueImplementation.cpp:1253) / our index sharding."""
    total = max(text.n - seedl + 1, 0)
    if num_windows is None:
        num_windows = total - start
    sig, comp, pos = _build_lists(
        text.words, text.nbits, text.ncum,
        jnp.int32(start), int(num_windows), seedl, jnp.int32(text.n))
    return SignatureIndex(sig=sig, comp=comp, pos=pos, seedl=seedl)
