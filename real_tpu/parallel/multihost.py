"""Multi-host execution (SURVEY §5.8, M5).

The reference is strictly single-node (POSIX threads + OpenMP + aio; no
MPI/NCCL/sockets anywhere — SURVEY §1). Scaling past one host is therefore
a new, TPU-native design:

* `jax.distributed.initialize()` connects the per-host processes; the
  global device mesh spans hosts.
* Mesh axes: ("dp", "shard") exactly as in parallel/mesh.py. The shard
  axis should stay INSIDE a host/ICI domain (index shards exchange
  all-gathered survivor records every step — keep that traffic on ICI);
  the dp axis can span hosts over DCN, because data-parallel read batches
  exchange NOTHING during matching — each host matches its own reads and
  only the final per-host results are concatenated on the host side.
* Input sharding: each process loads only its slice of the read set
  (`host_read_slice`), the direct analogue of per-host input files. The
  genome/packed text is replicated (2 bits/base: GRCh38 is ~750 MB —
  replicating it is far cheaper than sharding text windows across DCN).
* Output: each host writes its own slice's records; rank 0 concatenates
  (or a downstream cat does). Records are keyed by patid so order is
  reconstructible.

With jax.distributed initialized, engine/driver.py works unchanged on the
global mesh as long as every process feeds the same batch shapes: reads
are globally batched with `jax.make_array_from_process_local_data` over
the dp axis.

Single-process testing: `initialize_for_tests(n)` fakes a multi-process
topology on CPU virtual devices; tests/test_multihost.py runs the driver
under it and asserts equality with the single-process result
(tests/test_multihost_procs.py additionally spawns REAL separate
processes on a loopback coordinator).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np


@dataclasses.dataclass
class HostTopology:
    process_index: int
    process_count: int

    @property
    def is_coordinator(self) -> bool:
        return self.process_index == 0


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> HostTopology:
    """Connect this process to the multi-host job.

    On TPU pods the three arguments come from the environment and may all
    be None (jax.distributed autodetects); on CPU/GPU clusters pass them
    explicitly. Safe to call in a single-process job (no-op)."""
    import jax
    if num_processes is not None and num_processes > 1 \
            or coordinator_address is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id)
    return HostTopology(jax.process_index(), jax.process_count())


def host_read_slice(num_reads: int, topo: HostTopology) -> Tuple[int, int]:
    """[lo, hi) patid range this host matches — contiguous slices keep the
    output pass a simple per-host concat. Every host gets a multiple of
    16 reads except the last (batch padding stays shape-identical across
    hosts)."""
    per = -(-num_reads // topo.process_count)
    per = -(-per // 16) * 16
    lo = min(topo.process_index * per, num_reads)
    hi = min(lo + per, num_reads)
    return lo, hi


def dp_shard_axes(n_local_devices: int, n_processes: int,
                  total_index_shards: int) -> Tuple[int, int]:
    """Mesh shape for a multi-host job: the shard axis never crosses a
    host boundary (survivor all-gathers stay on ICI); dp = all remaining
    device parallelism (local dp x hosts, crossing DCN with zero per-step
    traffic)."""
    from real_tpu.parallel.plan import choose_mesh_shape
    local_dp, n_shard = choose_mesh_shape(n_local_devices,
                                          total_index_shards)
    return local_dp * n_processes, n_shard


def make_global_mesh(n_dp: int, n_shard: int):
    """Global (dp, shard) mesh over all processes' devices, laid out so
    each host's devices form complete shard groups."""
    import jax
    devs = np.asarray(jax.devices())
    assert devs.size >= n_dp * n_shard
    return jax.sharding.Mesh(
        devs[: n_dp * n_shard].reshape(n_dp, n_shard), ("dp", "shard"))


def run_unique_host_slice(cfg, rs, texts, topo: HostTopology):
    """matchUnique for THIS host's read slice.

    dp-over-hosts exchanges nothing during matching, so each process
    drives its own local (dp, shard) mesh on its addressable devices
    (engine/driver.py uses jax.local_devices()); reads outside the slice
    stay NoMatch and are skipped by the output pass, so concatenating the
    per-rank outputs in rank order reproduces the single-host file
    byte-for-byte."""
    from real_tpu.engine import driver
    lo, hi = host_read_slice(rs.num_reads, topo)
    if lo >= hi:
        return driver.run_match_unique(
            cfg, rs, texts, patid_filter=np.zeros(0, np.int64))
    return driver.run_match_unique(
        cfg, rs, texts, patid_filter=np.arange(lo, hi, dtype=np.int64))


def global_batch(mesh, local_rows: np.ndarray):
    """Assemble a global dp-sharded array from per-process local rows
    (jax.make_array_from_process_local_data): each process contributes
    its read slice; the result is addressable per-device exactly as the
    driver's dp sharding expects."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    sharding = NamedSharding(mesh, P("dp") if local_rows.ndim == 1
                             else P("dp", *([None] * (local_rows.ndim - 1))))
    return jax.make_array_from_process_local_data(sharding, local_rows)
