"""Multi-host execution (SURVEY §5.8, M5).

The reference is strictly single-node (POSIX threads + OpenMP + aio; no
MPI/NCCL/sockets anywhere — SURVEY §1). Scaling past one host is therefore
a new, TPU-native design:

* `jax.distributed.initialize()` connects the per-host processes (explicit
  coordinator arguments, or env autodetection on TPU pods).
* Data-parallel-over-hosts with per-process local meshes: read batches
  exchange NOTHING during matching, so each process drives its own local
  ("dp", "shard") mesh (parallel/mesh.py) over its addressable devices
  and matches only its own read slice. The shard axis stays inside a
  host/ICI domain by construction; the host dimension is pure dp over DCN
  with zero per-step traffic. (A single global mesh would buy nothing
  here — there is no cross-host collective in the workload — and would
  force global-array assembly on every batch.)
* Input sharding: each process parses only its slice of the read file
  (`parse_host_slice` → io/reads.parse_reads_sliced — record-boundary
  scan is vectorized; the expensive per-char mapping runs on 1/n of the
  file). The genome/packed text is replicated (2 bits/base: GRCh38 is
  ~750 MB — replicating is far cheaper than sharding text windows over
  DCN).
* Output: each host writes its own slice's records; concatenating the
  per-rank outputs in rank order reproduces the single-host file
  byte-for-byte (slices are contiguous in patid order and matchUnique's
  output pass is read-ordered).

tests/test_multihost.py spawns REAL separate processes on a loopback
coordinator and asserts that equality.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional, Tuple

# env vars whose presence indicates a distributed launch environment that
# jax.distributed.initialize() can autodetect (TPU pod / cluster runtimes)
_AUTODETECT_ENV = ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
                   "MEGASCALE_COORDINATOR_ADDRESS", "TPU_WORKER_HOSTNAMES")


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

    With explicit arguments they are passed through; with all-None
    arguments, a distributed environment is autodetected from the usual
    launcher env vars and `jax.distributed.initialize()` is called with
    no arguments (jax fills everything in from the environment). A plain
    single-process job stays a no-op."""
    import jax
    if num_processes is not None and num_processes > 1 \
            or coordinator_address is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id)
    elif any(os.environ.get(k) for k in _AUTODETECT_ENV):
        jax.distributed.initialize()
    return HostTopology(jax.process_index(), jax.process_count())


def host_read_slice(num_reads: int, topo: HostTopology) -> Tuple[int, int]:
    """[lo, hi) patid range this host matches — contiguous slices keep the
    output pass a simple per-host concat. Every host gets a multiple of
    16 reads except the last (batch padding stays shape-identical across
    hosts)."""
    from real_tpu.io.reads import split_records
    return split_records(num_reads, topo.process_index, topo.process_count)


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


def parse_host_slice(path: str, topo: HostTopology,
                     quality_offset: int = 0):
    """Parse only THIS host's record slice of the read file. Returns a
    host-local ReadSet (patids 0..n_local): matching and output run on it
    directly, and rank-order concat of outputs equals the single-host
    file."""
    from real_tpu.io import reads as reads_io
    rs, _lo, _total = reads_io.parse_reads_sliced(
        path, topo.process_index, topo.process_count, quality_offset)
    return rs
