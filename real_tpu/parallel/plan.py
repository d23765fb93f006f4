"""Memory-bounded execution planning.

TPU equivalent of the reference's RAM-budget block sizing
(matchUniqueImplementation.cpp:1208-1244, getPhysicalMemory.cpp): the
`-f` fracmem fraction of per-device HBM bounds how many index windows
one device may hold, which determines the number of index shards; shards
beyond the mesh's shard axis are processed in sequential passes (the
reference's "build block, re-stream all reads" outer loop,
:1253-1297).

Index cost model per window (index/build.py SignatureIndex):
  sig + pos = 8 bytes x 6 lists = 48 B, plus a transient build factor
  for lax.sort's out-of-place temporaries; bucket tables scale with the
  per-shard width (pick_bucket_bits, occupancy ~1) and are budgeted at
  the 2^25 cap: 6 x (2^25+1) x 4 B ~ 805 MB.
"""

from __future__ import annotations

import dataclasses
import math
import sys

import jax

BYTES_PER_WINDOW = 6 * 8
# Peak HBM per shard unit while the loop pipelines: the CURRENT unit's
# lists + the NEXT unit's lists + the next build's lax.sort temporaries
# (~2x the lists) coexist under the 2-in-flight dispatch bound — a
# factor-3 model OOM'd the 3.1 Gbp config's 64M-window shards on a
# 16 GB v5e
BUILD_FACTOR = 4.0
BUCKET_TABLE_BYTES = 2 * 6 * ((1 << 25) + 1) * 4   # two tables resident
_DEFAULT_HBM = 16 * 1024**3   # v5e per-chip HBM; fallback when unprobeable


def hbm_bytes_per_device() -> int:
    """Per-device memory budget. TPU: memory_stats()['bytes_limit'];
    CPU (virtual devices in tests): host RAM split across devices —
    the moral equivalent of getPhysicalMemory.cpp:34-87."""
    devs = jax.local_devices()
    try:
        stats = devs[0].memory_stats()
        if stats and stats.get("bytes_limit"):
            return int(stats["bytes_limit"])
    except Exception:
        pass
    if devs[0].platform != "cpu":
        # accelerator with unprobeable stats (e.g. tunneled/experimental
        # platforms): host RAM is NOT a proxy for HBM — a 125 GB MemTotal
        # fallback planned a single 140M-window shard and OOM'd a 16 GB
        # v5e
        return _DEFAULT_HBM
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("MemTotal:"):
                    kb = int(line.split()[1])
                    return kb * 1024 // max(len(devs), 1)
    except OSError:
        pass
    return _DEFAULT_HBM


def plan_index_shards(num_windows: int, fracmem: float,
                      reserved_bytes: int = 0,
                      hbm_bytes: int | None = None) -> int:
    """Number of index shards so one shard's lists (plus build
    temporaries) fit the fracmem budget of one device.

    Beyond the HBM bound, one extra shard can pay for itself by keeping
    per-shard bucket occupancy <= 2 (bucket bits cap at 2^25,
    index.build.pick_bucket_bits): below that the matcher skips
    in-bucket bisection (bucket gathers 2 + K lane gathers per probe vs
    2 + 16 bisection gathers + a re-check). The two candidates are
    compared by estimated gathers/read = shards * gathers-per-probe and
    the cheaper one wins — at Drosophila scale (140M windows) 3
    bisection-free shards beat 2 bisecting ones; at GRCh38 scale the
    occupancy is so high that fewer, bisecting shards win."""
    hbm = hbm_bytes if hbm_bytes is not None else hbm_bytes_per_device()
    budget = fracmem * hbm - BUCKET_TABLE_BYTES - reserved_bytes
    if budget <= 0:
        budget = 0.25 * hbm
    per_shard_cost = BYTES_PER_WINDOW * BUILD_FACTOR
    base = max(1, math.ceil(num_windows * per_shard_cost / budget))
    nobis = max(base, math.ceil(num_windows / (2 << 25)))

    def gathers(shards: int) -> float:
        occ = num_windows / shards / float(1 << 25)
        return shards * (2 + (16 if occ > 2.0 else 8))

    return nobis if gathers(nobis) < gathers(base) else base


# Serialized (non-pipelined) build peak per shard: lax.sort's input and
# output lists coexist (2x), previous unit's lists already freed, plus
# margin for the bucket-table histogram transient
SERIAL_BUILD_FACTOR = 2.2
# one bucket table resident at a time in serial mode; cap at 2^27
# entries (6 * 2^27 * 4 B = 3.2 GB) so the table never eats the budget
XXL_BITS_FLOOR, XXL_BITS_CAP = 25, 27


@dataclasses.dataclass
class StreamShardPlan:
    shards: int
    serial_build: bool       # driver must NOT pipeline units (peak = 2.2x)
    bucket_bits_cap: int     # pick_bucket_bits cap for these shards


# rough per-pass cost constants for the serial-vs-pipelined decision
# (r5 v5e measurements: ~58 ms per 32k-read step; chr21 one-shard build
# 4.08 s / 46.7M windows ~ 87 ns/window incl. the histogram)
MATCH_S_PER_READ_PASS = 2e-6
BUILD_S_PER_WINDOW = 80e-9


def plan_index_shards_streaming(num_windows: int, fracmem: float,
                                reserved_bytes: int = 0,
                                hbm_bytes: int | None = None
                                ) -> StreamShardPlan:
    """Shard plan when every pass RE-STREAMS the read file (reads exceed
    the resident budget — BASELINE config 4): a pass costs a full
    re-parse + upload of all reads (~90-125 s at 50M reads), so the
    planner minimizes PASSES, not per-pass gathers:

    * the build is serialized (match unit u fully, free its lists, then
      build u+1) so the peak is SERIAL_BUILD_FACTOR = 2.2x lists instead
      of the pipelined 4x — each shard holds ~2x the windows and the
      pass count drops accordingly (140M windows: 3 passes -> 2);
    * the bucket-table width cap rises from 25 to up to 27 bits so the
      bigger shards keep occupancy <= 2 and stay on the bisection-free
      lane path (a 2^26 table is 1.6 GB but only ONE is resident in
      serial mode); the cap stops where the table would exceed a third
      of the budget.

    The resident-reads case keeps plan_index_shards: there a pass is
    nearly free and build/match pipelining (2 units in flight) is worth
    the 4x transient. Reference analogue of the pass loop either way:
    matchUniqueImplementation.cpp:1253-1297."""
    hbm = hbm_bytes if hbm_bytes is not None else hbm_bytes_per_device()
    budget = fracmem * hbm - reserved_bytes
    if budget <= 0:
        budget = 0.25 * hbm
    pipe_plan = StreamShardPlan(
        shards=plan_index_shards(num_windows, fracmem,
                                 reserved_bytes=reserved_bytes,
                                 hbm_bytes=hbm_bytes),
        serial_build=False, bucket_bits_cap=25)
    # effective table width never exceeds what the window count can use
    # (pick_bucket_bits clamps to the window bit-length), so the table
    # cost model must clamp too or it overcharges small shards 64x
    wbits = max(num_windows - 1, 1).bit_length()

    def table_bytes(cap: int) -> int:
        return 6 * ((1 << min(cap, max(wbits, 12))) + 1) * 4

    bits_cap = XXL_BITS_FLOOR
    while bits_cap < XXL_BITS_CAP \
            and table_bytes(bits_cap + 1) < budget / 3:
        bits_cap += 1
    if budget <= 2 * table_bytes(bits_cap):
        # device too small for even one table + lists: the serial math
        # below would divide by a non-positive residual
        return pipe_plan
    per_shard = BYTES_PER_WINDOW * SERIAL_BUILD_FACTOR
    serial = max(1, math.ceil(num_windows * per_shard
                              / (budget - table_bytes(bits_cap))))
    # shrink the cap to the narrowest width that still keeps the planned
    # shards' occupancy <= 2 (a 2^27 table is 3.2 GB; don't pay for it
    # when 2^26 already makes the shard bisection-free), then replan —
    # the smaller table can only allow fewer/equal shards
    need = max(-(-num_windows // serial) // 2, 1)
    bits_cap = min(bits_cap, max(XXL_BITS_FLOOR,
                                 (need - 1).bit_length()))
    serial = max(1, math.ceil(num_windows * per_shard
                              / (budget - table_bytes(bits_cap))))
    if serial >= pipe_plan.shards:
        # memory never binds (small genome): keep the pipelined plan
        return pipe_plan
    return StreamShardPlan(shards=serial, serial_build=True,
                           bucket_bits_cap=bits_cap)


def choose_mesh_shape(n_devices: int, total_shards: int):
    """(n_dp, n_shard): the shard axis is the largest divisor of
    n_devices that is <= total_shards (so no shard device idles); the
    rest is read data-parallelism."""
    n_shard = 1
    for d in range(1, n_devices + 1):
        if n_devices % d == 0 and d <= total_shards:
            n_shard = d
    return n_devices // n_shard, n_shard
