"""Pallas slice-gather: W consecutive uint32 words at N random offsets.

This is the hot fetch of candidate verification — the nw+1 aligned text
words covering each survivor window (matchstep._extract_windows; the
reference walks the same words one at a time in RestMatch.hpp:39-81 via
AutoTextArray::getTextWord, AutoTextArray.hpp:122-125). XLA lowers the
fetch to ~9 ns per gathered element on v5e regardless of formulation
(benchmarks/pallasbench.py); this kernel does it in ~2.4 ns/element:

  * the SCALAR core acts as a DMA-issue engine: one [2, 128]-row DMA per
    lane — the two 512 B table rows covering the window — into a staging
    buffer, 1024 lanes per chunk, double-buffered, hand-unrolled x4
    (~19 cycles/lane, the measured throughput limit);
  * ONE bulk semaphore wait drains each chunk (TPU DMA semaphores count
    bytes, so a single descriptor sized like the whole chunk buffer
    waits for all 1024 per-lane copies);
  * the VPU extracts the W window columns from the staged rows with
    take_along_axis — Mosaic's lane-wise dynamic gather (the only
    vectorized gather it supports: equal [N, 128] shapes, axis=1).

The kernel is bandwidth-amplified 32x (1 KB moved per 32 B window) and
still wins 3.6x because v5e HBM absorbs ~820 GB/s while XLA's gather is
element-issue-bound. The table lives in HBM (pl.ANY), so the win is
independent of shard size — it applies to every BASELINE config.

Toolchain constraints honored here (discovered in pallasbench, jax
0.9.0 Mosaic remote-compile): whole-row DMAs only, grid=(1,) with
unblocked SMEM index input (SMEM caps ~128 KB -> 16K-lane slabs),
no in-kernel dynamic_slice, unroll by hand.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

LANE = 128
SLAB = 16_384          # lanes per pallas_call (index slab must fit SMEM)
CHUNK = 1024           # lanes per DMA chunk (double-buffered)
_UNROLL = 4
_MIN_LANES = 4096      # below this, XLA's gather overhead is noise


def use_pallas_gather(n_lanes: int, w: int, table_bytes: int = 0) -> bool:
    """Kernel applies: TPU backend, big enough batch, window fits the
    2-row staging (w <= 128), not disabled for A/B.

    The kernel's ~20 ns/lane is issue-rate-bound, so per ELEMENT it
    costs ~20/w ns vs XLA's ~9 ns (small tables) to ~16 ns (HBM-scale
    tables, >~256 MB). W >= 3 wins everywhere; narrower slices only
    win against the HBM-scale gather, so W < 3 requires a big table
    (pass table_bytes; 0 = unknown = assume big)."""
    if os.environ.get("REAL_TPU_NO_PALLAS"):
        return False
    if w > 120 or n_lanes < _MIN_LANES:
        return False
    if w < 3 and 0 < table_bytes < 256 * 1024 * 1024:
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


@functools.lru_cache(maxsize=None)
def _window_call(w: int):
    """pallas_call returning the W words per lane: [nch, CHUNK, w]."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nch = SLAB // CHUNK

    def kern(idx_ref, cm_ref, t_ref, o_ref, buf, sems):
        lanei = lax.broadcasted_iota(jnp.int32, (CHUNK, LANE), 1)

        def issue(ci):
            b = lax.rem(ci, 2)
            base = ci * CHUNK

            def one(jj, _):
                for u in range(_UNROLL):
                    j = jj * _UNROLL + u
                    p = idx_ref[base + j]
                    pltpu.make_async_copy(
                        t_ref.at[pl.ds(p // LANE, 2), :],
                        buf.at[b, pl.ds(2 * j, 2), :], sems.at[b]).start()
                return 0
            lax.fori_loop(0, CHUNK // _UNROLL, one, 0)

        def drain(ci):
            b = lax.rem(ci, 2)
            pltpu.make_async_copy(
                t_ref.at[pl.ds(0, 2 * CHUNK), :], buf.at[b],
                sems.at[b]).wait()

        issue(0)

        def outer(ci, _):
            b = lax.rem(ci, 2)

            @pl.when(ci + 1 < nch)
            def _():
                issue(ci + 1)
            drain(ci)
            bb = buf[b].reshape(CHUNK, 2, LANE)
            pos = cm_ref[ci] + lanei
            sel = pos >= LANE
            cmod = pos - jnp.where(sel, LANE, 0)
            g0 = jnp.take_along_axis(bb[:, 0, :], cmod, axis=1)
            g1 = jnp.take_along_axis(bb[:, 1, :], cmod, axis=1)
            win = jnp.where(sel, g1, g0)
            o_ref[ci] = win[:, :w]
            return 0
        lax.fori_loop(0, nch, outer, 0)

    return pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nch, CHUNK, w), jnp.int32),
        scratch_shapes=[pltpu.VMEM((2, 2 * CHUNK, LANE), jnp.int32),
                        pltpu.SemaphoreType.DMA((2,))],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024,
            has_side_effects=True))


def gather_word_windows(words: jnp.ndarray, idx: jnp.ndarray, w: int):
    """words[idx[...] + k] for k in range(w) as a list of w arrays shaped
    like idx — a drop-in replacement for w separate clip-mode takes.

    `words` is a 1-D 32-bit table (packed text words, signature lists,
    bucket tables); `idx` int32 start offsets (any shape). The START
    index clamps like mode="clip"; elements past the table end read the
    zero padding (callers mask them — the production windows never use
    bits beyond pos+patl, and lane validity masks out-of-range lanes).
    Output dtype matches the table's."""
    nch = SLAB // CHUNK
    shape = idx.shape
    n0 = int(np.prod(shape))
    mw = words.shape[0]

    # pad the table so row r+1 exists for every clipped index, and the
    # final clip window [mw-1, mw-1+w) stays in-bounds
    rows = (mw + LANE - 1) // LANE + 1
    t2d = lax.bitcast_convert_type(
        jnp.pad(words, (0, rows * LANE - mw)), jnp.int32
    ).reshape(rows, LANE)

    flat = jnp.clip(idx.reshape(-1), 0, mw - 1).astype(jnp.int32)
    n = -(-n0 // SLAB) * SLAB
    if n != n0:
        flat = jnp.pad(flat, (0, n - n0))

    call = _window_call(w)
    outs = []
    for k in range(n // SLAB):
        sl = lax.dynamic_slice(flat, (k * SLAB,), (SLAB,))
        cm = (sl % LANE).reshape(nch, CHUNK)[:, :, None] \
            + jnp.zeros((1, 1, LANE), jnp.int32)
        outs.append(call(sl, cm, t2d).reshape(SLAB, w))
    out = outs[0] if len(outs) == 1 else jnp.concatenate(outs)
    out = lax.bitcast_convert_type(out[:n0], words.dtype)
    out = out.reshape(*shape, w)
    return [out[..., k] for k in range(w)]
