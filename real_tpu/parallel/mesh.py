"""Multi-chip scaling: index sharding + read data-parallelism on a Mesh.

TPU-first replacement for the reference's sequential memory-bounded block
streaming (matchUniqueImplementation.cpp:1253-1297): instead of building
index blocks one after another and re-streaming all reads per block, every
device holds ONE index shard (a contiguous window range of the genome) and
its slice of the read batch; the packed text (2 bits/base, 18x smaller than
the lists) is replicated.

Mesh axes:
  dp    — reads are data-parallel (reference: OpenMP threads over blocks)
  shard — the index is sharded (reference: sequential blocks)

Cross-shard merge: each device's verified survivors (<= S per read) are
all-gathered over the shard axis and folded through the best-hit automaton
in shard-major order — which IS the reference's block-major merge order, so
even the order-sensitive scores mode stays bit-exact (see
matchstep.fold_unique). The no-scores automaton additionally folds into an
associative (left-biased, commutative across shards' disjoint loci) monoid
(engine/monoid.py), so that mode could use an ordered tree-reduce; we keep
the ordered gather-fold for both since survivor tensors are tiny
(n_shard * B * S records).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from real_tpu.engine.matchstep import (CompactHits, MatchState, Survivors,
                                       compact_hits, fold_unique,
                                       scored_survivors)
from real_tpu.index.signatures import NUM_LISTS
from real_tpu.text.packed import PackedText


def make_mesh(n_dp: int, n_shard: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.local_devices()
    assert len(devices) >= n_dp * n_shard
    dev = np.asarray(devices[: n_dp * n_shard]).reshape(n_dp, n_shard)
    return Mesh(dev, ("dp", "shard"))


@functools.partial(jax.jit,
                   static_argnames=("seedl", "num_windows", "per_shard",
                                    "mesh", "order_sentinels",
                                    "bucket_bits"))
def build_sharded_index(words, nb16, ncum16, n, start=0, *, seedl: int,
                        num_windows: int = 0, per_shard: int = 0,
                        mesh: Mesh, order_sentinels: bool = False,
                        bucket_bits: int = 0):
    """Build [n_shard, 6, M_s] index arrays, shard s covering windows
    [start + s*M_s, start + (s+1)*M_s). Each device sorts only its own
    shard's lists. Pass either per_shard directly (multi-pass driver:
    one pass covers n_shard*per_shard windows from `start`) or
    num_windows (single pass over the whole range, per_shard derived).
    start and per_shard must be 16-aligned."""
    from real_tpu.index.hostbuild import _round16
    from real_tpu.index.signatures import SigConfig
    n_shard = mesh.shape["shard"]
    per = per_shard or _round16(-(-num_windows // n_shard))
    wide = SigConfig(seedl).wide

    def local_build(words, nb16, ncum16, n, start):
        from real_tpu.index.build import build_lists_impl
        s = lax.axis_index("shard")
        shi, sig, pos, bb = build_lists_impl(
            words, nb16, ncum16, start + (s * per).astype(jnp.int32), per,
            seedl, n, order_sentinels=order_sentinels,
            bucket_bits=bucket_bits)
        if wide:
            return shi[None], sig[None], pos[None], bb[None]
        return sig[None], pos[None], bb[None]

    fn = jax.shard_map(
        local_build, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P()),
        out_specs=P("shard"))
    out = fn(words, nb16, ncum16, n, jnp.int32(start))
    if wide:
        return out            # (sig_hi, sig, pos, bb)
    return (None,) + tuple(out)


@functools.partial(
    jax.jit,
    static_argnames=("tables", "seedl", "seedkmax", "totalkmax", "cand_cap",
                     "survivor_cap", "scores", "score_mode", "mesh",
                     "bsearch_steps", "text_has_n", "matchall"))
def sharded_match_step(index_sig, index_pos, index_bb,
                       words, nbits, ncum, frag_offsets,     # replicated
                       codes, quals, read_valid,             # [B,...] dp
                       state: MatchState, fileid, epsilon,
                       index_sig_hi=None,                    # [n_shard,6*M]
                       *, tables=None, seedl: int, seedkmax: int,
                       totalkmax: int, cand_cap: int, survivor_cap: int,
                       scores: bool, score_mode: str, mesh: Mesh,
                       bsearch_steps: int = 0, text_has_n: bool = True,
                       matchall: bool = False):
    """One full step over the mesh: every (dp, shard) device verifies its
    read slice against its index shard; survivors are all-gathered over
    'shard' and folded in shard-major (= reference block-major) order.

    Returns (new_state, overflow [B]) for matchUnique, or
    (state, Survivors [B, n_shard*S] shard-major) for matchall=True."""

    def local_step(sig, pos, bb, sig_hi, words, nbits, ncum, frag_offsets,
                   codes, quals, read_valid, state, fileid, epsilon):
        sig, pos, bb = sig[0], pos[0], bb[0]   # drop the shard dim
        sig_hi = sig_hi[0] if sig_hi is not None else None
        surv = scored_survivors(
            sig, pos, bb, words, nbits, ncum, frag_offsets,
            codes, quals, read_valid,
            tables=tables, seedl=seedl, seedkmax=seedkmax,
            totalkmax=totalkmax, cand_cap=cand_cap,
            survivor_cap=survivor_cap, scores=scores, score_mode=score_mode,
            bsearch_steps=bsearch_steps, text_has_n=text_has_n,
            index_sig_hi=sig_hi)
        # gather survivors over the shard axis: [n_shard, B_loc, S]
        gathered = jax.tree.map(
            lambda a: lax.all_gather(a, "shard", axis=0, tiled=False),
            surv)

        def shard_major(a):   # [n_shard, B, S] -> [B, n_shard*S]
            return jnp.swapaxes(a, 0, 1).reshape(a.shape[1], -1)

        seq = Survivors(
            valid=shard_major(gathered.valid),
            inv=shard_major(gathered.inv),
            pos=shard_major(gathered.pos),
            frag=shard_major(gathered.frag),
            k=shard_major(gathered.k),
            score=shard_major(gathered.score),
            overflow=gathered.overflow.any(axis=0),
        )
        if matchall:
            # compact on device BEFORE leaving the mesh: the raw gathered
            # survivor tensors are the D2H bandwidth hog (see
            # matchstep.CompactHits); row ids are LOCAL to this dp slice
            cap = max(2 * codes.shape[0],
                      codes.shape[0] * seq.valid.shape[1] // 2)
            ch = compact_hits(seq, cap=cap)
            return state, ch._replace(count=ch.count.reshape(1))
        new_state = fold_unique(state, seq, fileid, epsilon, scores=scores)
        return new_state, seq.overflow

    out_spec = (CompactHits(*([P("dp")] * 6)) if matchall else P("dp"))
    fn = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(P("shard"), P("shard"), P("shard"),
                  jax.tree.map(lambda _: P("shard"), index_sig_hi),
                  P(), P(), P(), P(),
                  P("dp"), jax.tree.map(lambda _: P("dp"), quals), P("dp"),
                  jax.tree.map(lambda _: P("dp"), state),
                  P(), P()),
        out_specs=(jax.tree.map(lambda _: P("dp"), state), out_spec),
        check_vma=False)
    return fn(index_sig, index_pos, index_bb, index_sig_hi, words, nbits,
              ncum, frag_offsets, codes, quals, read_valid, state,
              jnp.int32(fileid), jnp.float32(epsilon))
