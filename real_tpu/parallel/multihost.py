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


class BuildExchange:
    """De-replicated index construction (VERDICT r4 missing #3).

    r4's multi-host efficiency (0.43-0.49 @ 2 procs) was capped by every
    process building the FULL index while reads are split N ways. The
    workload's exact semantics pin each read's fold to one process
    (scores mode is order-defined, engine/monoid.py), so the fix
    de-replicates the BUILD instead: index shards are round-robin OWNED
    by rank (shard_unit % P); each rank builds only its own shards and
    the built arrays are exchanged, so build work is 1/P per process.

    Exchange transport here is the shared filesystem (np.save + a .done
    marker; consumers poll): on the single-machine CPU bench the arrays
    move through the page cache, and any pod-scale deployment with a
    shared FS (GCS fuse, NFS) works unchanged. On a real TPU pod the
    natural transport is an `all_gather` of the built shard over the ICI
    mesh instead — the ownership pattern and ascending-shard visit order
    (which scores-mode exactness requires) are identical; only
    save/load would swap for the collective."""

    def __init__(self, root: str, topo: HostTopology,
                 timeout_s: float = 600.0):
        self.root = root
        self.topo = topo
        self.timeout_s = timeout_s
        os.makedirs(root, exist_ok=True)

    def owns(self, unit: int) -> bool:
        return unit % self.topo.process_count == self.topo.process_index

    def _base(self, unit: int) -> str:
        return os.path.join(self.root, f"shard_{unit:05d}")

    def save(self, unit: int, index) -> None:
        """Publish an owned shard's built arrays (host numpy)."""
        import numpy as np
        base = self._base(unit)
        arrays = dict(sig=np.asarray(index.sig), pos=np.asarray(index.pos),
                      bb=np.asarray(index.bb),
                      seedl=np.asarray([index.seedl]),
                      bucket_bits=np.asarray([index.bucket_bits]))
        if index.sig_hi is not None:
            arrays["sig_hi"] = np.asarray(index.sig_hi)
        np.savez(base + ".tmp.npz", **arrays)
        os.replace(base + ".tmp.npz", base + ".npz")
        with open(base + ".done.tmp", "w") as f:
            f.write("ok")
        os.replace(base + ".done.tmp", base + ".done")

    def load(self, unit: int):
        """Block until the owning rank published `unit`, then load it to
        the local device."""
        import time

        import jax.numpy as jnp
        import numpy as np

        from real_tpu.index.build import SignatureIndex
        base = self._base(unit)
        t0 = time.monotonic()
        while not os.path.exists(base + ".done"):
            if time.monotonic() - t0 > self.timeout_s:
                raise TimeoutError(
                    f"rank {self.topo.process_index}: shard {unit} not "
                    f"published by its owner within {self.timeout_s}s")
            time.sleep(0.02)
        with np.load(base + ".npz") as z:
            return SignatureIndex(
                sig=jnp.asarray(z["sig"]), pos=jnp.asarray(z["pos"]),
                bb=jnp.asarray(z["bb"]), seedl=int(z["seedl"][0]),
                bucket_bits=int(z["bucket_bits"][0]),
                sig_hi=jnp.asarray(z["sig_hi"]) if "sig_hi" in z else None)
