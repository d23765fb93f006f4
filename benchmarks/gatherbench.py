"""Microbenchmark: random-gather strategies on the TPU.

The match step is gather-bound (BASELINE.md roofline; the r3 trace shows
~18 per-lane [B,S] gathers at ~21 ns/element = 2/3 of the step). This
probe measures, on the real device, the cost of the candidate fetch
patterns we can choose between:

  take1      - N independent jnp.take gathers of 1 element each, x reps
  take_s8    - ONE lax.gather fetching 8 consecutive elements per index
               (slice_sizes=(8,)) -- the fused window-word fetch
  take_rows  - gather of [M/8, 8] rows at aligned row indices
  take2d     - interleaved [M, 2] (sig, pos) row gather
  sortidx    - take1 with pre-sorted indices (locality effect)

Prints one JSON line of ns/element for each. Usage:
  python benchmarks/gatherbench.py [--m 280000000] [--n 1000000]
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(f, *args, reps=5):
    r = f(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(reps):
        r = f(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=280_000_000)
    ap.add_argument("--n", type=int, default=1_000_000)
    args = ap.parse_args()
    M, N = args.m, args.n

    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.integers(0, 1 << 30, M, dtype=np.int32))
    idx = jnp.asarray(rng.integers(0, M - 8, N, dtype=np.int32))
    idx_sorted = jnp.sort(idx)
    # NOTE: a [M/8, 8] 2-D table is NOT benchmarked: TPU tiles s32 arrays
    # at (8,128), so the 8-wide minor dim pads 16x (17.9 GB for 280M) —
    # narrow-minor-dim layouts are unusable for big tables.

    out = {"device": str(jax.devices()[0]), "M": M, "N": N}

    @jax.jit
    def take1(t, i):
        return jnp.take(t, i).sum()

    @jax.jit
    def take8sep(t, i):
        acc = jnp.zeros((), jnp.int32)
        for k in range(8):
            acc += jnp.take(t, i + k).sum()
        return acc

    @jax.jit
    def take_s8(t, i):
        g = jax.lax.gather(
            t, i[:, None],
            jax.lax.GatherDimensionNumbers(
                offset_dims=(1,), collapsed_slice_dims=(),
                start_index_map=(0,)),
            slice_sizes=(8,), mode="clip")
        return g.sum()

    out["take1_ns"] = round(timeit(take1, table, idx) / N * 1e9, 2)
    out["take1_sorted_ns"] = round(
        timeit(take1, table, idx_sorted) / N * 1e9, 2)
    out["take8sep_ns_per_elem"] = round(
        timeit(take8sep, table, idx) / (8 * N) * 1e9, 2)
    out["take_s8_ns_per_elem"] = round(
        timeit(take_s8, table, idx) / (8 * N) * 1e9, 2)

    # 2-D shaped index (the [B, S] phase-2 shape) vs flat
    B = 8192
    S = max(N // B, 1)
    idx2 = idx[: B * S].reshape(B, S)

    @jax.jit
    def take_2dshape(t, i):
        return jnp.take(t, i).sum()

    out["take_bs_ns"] = round(
        timeit(take_2dshape, table, idx2) / (B * S) * 1e9, 2)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
