"""The experiment that decides the gather floor (VERDICT r4 missing #1).

The match step's remaining device time is spent on slice-gathers: W
consecutive uint32 words fetched at N random offsets of a large table —
W=8 window words per survivor lane (matchstep._extract_windows, the
RestMatch.hpp:39-81 analogue) and W=4 lane signatures per probe
(find_survivors tier-1).

RESULT (v5e, r5): a Pallas kernel BEATS XLA's gather 3.6x on the window
fetch. Design: the scalar core is a DMA-issue engine — one [2, 128]-row
DMA per lane (the two 512 B rows covering the window), double-buffered
chunks of 1024 lanes, ONE bulk semaphore wait per chunk (DMA semaphores
count bytes, so a descriptor sized like the whole chunk buffer drains
all 1024 per-lane copies) — and the VPU extracts the W window columns
from the staged rows with take_along_axis (Mosaic's lane-wise dynamic
gather, the only vectorized gather shape it supports: equal-shape 2-D,
axis=1, minor dim 128). Measured ns per USEFUL gathered element:

    xla_take8 (production XLA path)   8.8 ns/elem   70 ns/lane
    scalar-loop VMEM loads + roll    29.9 ns/elem  240 ns/lane
    row-DMA + per-lane waits          3.9 ns/elem   31 ns/lane
    row-DMA + bulk wait               3.1 ns/elem   25 ns/lane
    row-DMA + bulk wait + unroll 4    2.4 ns/elem   20 ns/lane  <- winner

The winner is issue-rate-bound on the scalar core (~19 cycles/lane), not
bandwidth-bound: it moves 1 KB per 32 B window (32x amplification) and
still wins because v5e HBM (~820 GB/s) absorbs it — 16K lanes/chunk
stream 16 MB in ~20 us while issue takes ~320 us. Production form:
real_tpu/ops/pallas_gather.py (returns the W words, not their sum).

Mosaic/toolchain constraints discovered here (r5, jax 0.9.0 remote
compile): 1-D or sub-row DMAs crash the compile helper (whole [k, 128]
rows work); multi-step grids with SMEM-blocked specs crash (grid=(1,)
or unblocked SMEM inputs work, SMEM caps ~128 KB); dynamic_slice and
per-lane dynamic lane-offset ref reads are unsupported in-kernel;
take_along_axis lowers only for equal [N, 128] shapes on axis=1;
fori_loop unroll must be 1 or the full trip count (unroll by hand).

TIMING CAVEAT (r5): on this round's axon platform, jax.block_until_ready
returns BEFORE device completion — naive timing bottoms out at the ~2-4
ms dispatch floor and "measured" a 4096^3 matmul at 3036 TFLOP/s (v5e
peak 394). Every number here therefore uses dependency-chained reps
ending in a scalar fetch, minus a separately measured per-dispatch
latency (~2.4 ms through the tunnel). The r4 gatherbench numbers (~12
ns/element) were taken when blocking worked and agree with this
harness's xla_take8 within noise.

Usage:
  python benchmarks/pallasbench.py [--m 2920000] [--n 262144] [--w 8]
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def timed(f, reps: int = 10):
    """Chained reps + scalar fetch; returns (secs_per_rep, scalar)."""
    s = f()
    v0 = float(s)
    t0 = time.perf_counter()
    for _ in range(reps):
        s = f()
    v = float(s)
    assert v == v0, "variant is nondeterministic across reps"
    return (time.perf_counter() - t0) / reps, v


def dispatch_latency():
    """Fixed cost of one tiny chained dispatch (tunnel round trips)."""
    x = jnp.zeros((8, 128), jnp.float32)

    @jax.jit
    def tick(x):
        return (x + 1.0).sum()
    dt, _ = timed(lambda: tick(x), reps=20)
    return dt


def xla_take8(table2d, idx, w: int):
    @jax.jit
    def f(t, i):
        tf = t.reshape(-1)
        acc = jnp.zeros(i.shape, jnp.uint32)
        for k in range(w):
            acc = acc + jnp.take(tf, i + k, mode="clip")
        return acc.sum()
    return (lambda: f(table2d, idx))


def pal_rowdma(table2d, idx, w: int, slab: int = 16_384,
               ch: int = 1024, unroll: int = 4):
    """The winning kernel (sum-reduced output for benchmarking)."""
    n = idx.shape[0]
    nch = slab // ch

    def kern(idx_ref, cm_ref, t_ref, o_ref, buf, sems):
        lanei = jax.lax.broadcasted_iota(jnp.int32, (ch, LANE), 1)

        def issue(ci):
            b = jax.lax.rem(ci, 2)
            base = ci * ch

            def one(jj, _):
                for u in range(unroll):
                    j = jj * unroll + u
                    p = idx_ref[base + j]
                    pltpu.make_async_copy(
                        t_ref.at[pl.ds(p // LANE, 2), :],
                        buf.at[b, pl.ds(2 * j, 2), :], sems.at[b]).start()
                return 0
            jax.lax.fori_loop(0, ch // unroll, one, 0)

        def drain(ci):
            # one wait for all ch copies: DMA semaphores count bytes and
            # this descriptor's size equals the whole chunk buffer
            b = jax.lax.rem(ci, 2)
            pltpu.make_async_copy(
                t_ref.at[pl.ds(0, 2 * ch), :], buf.at[b], sems.at[b]).wait()

        issue(0)

        def outer(ci, _):
            b = jax.lax.rem(ci, 2)

            @pl.when(ci + 1 < nch)
            def _():
                issue(ci + 1)
            drain(ci)
            bb = buf[b].reshape(ch, 2, LANE)
            cm = cm_ref[ci]
            pos = cm + lanei
            sel = pos >= LANE
            cmod = pos - jnp.where(sel, LANE, 0)
            g0 = jnp.take_along_axis(bb[:, 0, :], cmod, axis=1)
            g1 = jnp.take_along_axis(bb[:, 1, :], cmod, axis=1)
            win = jnp.where(sel, g1, g0)
            o_ref[ci, :] = jnp.sum(
                jnp.where(lanei < w, win, 0).astype(jnp.int32), axis=1)
            return 0
        jax.lax.fori_loop(0, nch, outer, 0)

    pc = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nch, ch), jnp.int32),
        scratch_shapes=[pltpu.VMEM((2, 2 * ch, LANE), jnp.uint32),
                        pltpu.SemaphoreType.DMA((2,))],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024,
            has_side_effects=True))

    @jax.jit
    def pal(i, t):
        outs = []
        for k in range(n // slab):
            sl = jax.lax.dynamic_slice(i, (k * slab,), (slab,))
            cm = (sl % LANE).reshape(nch, ch)[:, :, None] \
                + jnp.zeros((1, 1, LANE), jnp.int32)
            outs.append(pc(sl, cm, t).reshape(-1))
        return jnp.concatenate(outs).astype(jnp.uint32).sum()
    return (lambda: pal(idx, table2d))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=2_920_000)  # chr21 words
    ap.add_argument("--n", type=int, default=262_144)    # B*S at 32k x 8
    ap.add_argument("--w", type=int, default=8)
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()
    M, N, W = args.m, args.n, args.w

    rng = np.random.default_rng(0)
    rows = M // LANE
    t2d = jnp.asarray(
        rng.integers(0, 1 << 31, (rows, LANE), dtype=np.int32)
    ).astype(jnp.uint32)
    idx = jnp.asarray(rng.integers(0, M - 2 * LANE, N, dtype=np.int32))

    lat = dispatch_latency()
    out = {"device": str(jax.devices()[0]), "M": M, "N": N, "W": W,
           "dispatch_us": round(lat * 1e6, 1)}

    ref_v = None
    for name, maker in [("xla_take8", xla_take8), ("pal_rowdma", pal_rowdma)]:
        try:
            f = maker(t2d, idx, W)
            dt, v = timed(f, reps=args.reps)
            if ref_v is None:
                ref_v = v
            out[f"{name}_ns"] = round(max(dt - lat, 0.0) / (N * W) * 1e9, 2)
            out[f"{name}_ok"] = bool(v == ref_v)
        except Exception as e:  # compile refusal is itself a result
            out[f"{name}_error"] = f"{type(e).__name__}: {str(e)[:300]}"
    print(json.dumps(out))


if __name__ == "__main__":
    main()
