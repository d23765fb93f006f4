"""Host->device input pipeline.

TPU equivalent of the reference's L2 async I/O layer: a producer thread +
bounded queue feeding the matcher (AsynchronousReader.hpp:181-259,
AsynchronousBufferReader.hpp double buffering).

Reads cross the host->device link 2-BIT PACKED ([rows, ceil(patl/16)]
uint32, the reference's TemporaryFile.hpp:231-268 byte packing widened to
words) and are unpacked to [rows, patl] uint8 codes by a tiny jitted
device op per batch. The link is the scarce resource (the tunneled v5e
measured ~40 MB/s; a 50M x 100bp config re-streamed 5 GB of uint8 codes
per index-shard pass in r4 — packing cuts that 3.6x, residency cuts it
to once).

Two modes, chosen by a device-memory budget over the PACKED bytes:

* resident: the packed reads are uploaded once and stay on device across
  index-shard passes; each pass re-derives the uint8 codes batch by
  batch (transient buffers, freed after the step consumes them).
* streaming: packed batches are uploaded by a background thread at most
  `prefetch` ahead of the match loop; the host-side packed arrays are
  cached (up to _HOST_CACHE_MAX) so later passes skip the memmap read
  and repacking. Each index-shard pass re-streams the batches — the
  reference's "re-stream all reads per block" outer product
  (matchUniqueImplementation.cpp:1260-1262).
"""

from __future__ import annotations

import dataclasses
import functools
import queue
import threading
from typing import Dict, Iterator, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from real_tpu import bitpack
from real_tpu.io import reads as reads_io

# host-side packed-batch cache cap (streaming mode): 4 GB covers ~150M
# 100bp reads; beyond that later passes re-pack from the memmap store
_HOST_CACHE_MAX = 4 << 30


@dataclasses.dataclass
class BatchPlan:
    """Host-side description of one fixed-shape batch."""
    patids: np.ndarray     # int64 [n] (n <= rows)
    patl: int
    rows: int              # padded row count (static batch shape)


@dataclasses.dataclass
class Batch:
    patids: np.ndarray     # int64 [n] (n <= rows)
    patl: int
    codes: jnp.ndarray     # uint8 [rows, patl] (padded rows zero)
    quals: Optional[jnp.ndarray]  # int8 [rows, patl]; None = FASTA const 30
    valid: jnp.ndarray     # bool  [rows]


@functools.partial(jax.jit, static_argnames=("patl",))
def _unpack_rows(words: jnp.ndarray, patl: int) -> jnp.ndarray:
    """[B, KW] uint32 (MSB-first 16 bases/word, bitpack.pack_rows_2bit)
    -> [B, patl] uint8 codes."""
    shifts = jnp.asarray(2 * (15 - np.arange(16)), dtype=jnp.uint32)
    c = ((words[:, :, None] >> shifts) & 3).astype(jnp.uint8)
    return c.reshape(words.shape[0], -1)[:, :patl]


def packed_batch_bytes(rows: int, patl: int, has_quals: bool) -> int:
    """Device bytes of one packed batch (codes words + quals + valid)."""
    kw = (patl + 15) // 16
    return rows * (4 * kw + (patl if has_quals else 0) + 1)


def _round_b(n: int, bmax: int) -> int:
    """Pad batch rows to the next power of two, floored at 512 (limits
    jit retraces AND shares one compiled shape between the tiny
    overflow-rerun batches of different runs — a 3-read warmup rerun and
    a 300-read production rerun both pad to 512, so the escalated-cap
    step compiles once)."""
    b = 512
    while b < n:
        b *= 2
    return min(b, bmax)


def make_plans(rs: reads_io.ReadSet, batch_size: int, seedl: int,
               patid_filter: Optional[np.ndarray] = None,
               row_align: int = 1,
               warn=None, max_rows: int = 0) -> List[BatchPlan]:
    """Length-bucketed fixed-shape batch plans. row_align makes every
    batch's row count divisible by the mesh dp axis. One device shape per
    length bucket: tail batches pad to the same row count as full batches
    (jit compiles once per bucket). max_rows caps the batch shape below
    batch_size — overflow reruns use 512-row batches so the
    escalated-cap step always reuses one warm compiled shape instead of
    cold-compiling at whatever row count the overflow happens to pad to
    (a 19831-read rerun cost 91 s of in-run compile at fly scale)."""
    plans: List[BatchPlan] = []
    warned_short = False
    if max_rows:
        batch_size = min(batch_size, max_rows)
    B = -(-batch_size // row_align) * row_align
    fmask = None
    if patid_filter is not None:
        # boolean-mask membership: np.isin sorts both sides (~4 s at 50M
        # reads per overflow rerun); the mask lookup is one linear pass
        fmask = np.zeros(rs.num_reads, bool)
        fmask[patid_filter] = True
    for patl, patids in sorted(rs.length_buckets().items()):
        if fmask is not None:
            patids = patids[fmask[patids]]
            if len(patids) == 0:
                continue
        if patl < seedl:
            if not warned_short and warn is not None:
                warn(f"Skipping {len(patids)} patterns shorter than seed "
                     "length.")
                warned_short = True
            continue
        bucket_rows = B if len(patids) > B else _round_b(len(patids), B)
        bucket_rows = -(-bucket_rows // row_align) * row_align
        nb = -(-len(patids) // bucket_rows)
        for k in range(nb):
            plans.append(BatchPlan(
                patids=patids[k * bucket_rows:(k + 1) * bucket_rows],
                patl=patl, rows=bucket_rows))
    return plans


def _pack_host(rs: reads_io.ReadSet, plan: BatchPlan,
               chunk: int = 1 << 21):
    """Pack one plan's reads to the fixed-shape PACKED host arrays:
    (codes_words u32 [rows, KW], quals i8 | None, valid bool).

    Processed in bounded row chunks straight into preallocated outputs:
    the resident-upload path hands this the WHOLE 50M-read bucket (one
    plan), and the earlier whole-bucket form (a full uint8 copy + the
    uint32 broadcast pack) allocated tens of GB and took ~10 minutes of
    the config-4 wall. The native row packer (readpack.cpp
    pack_rows_2bit) does the shift work when available; codes 4 (N) are
    packed as their low bits and masked via `valid`, like the reference
    (AutoTextArray.hpp:27-43)."""
    n = len(plan.patids)
    kw = (plan.patl + 15) // 16
    words = np.zeros((plan.rows, kw), np.uint32)
    valid = np.zeros(plan.rows, bool)
    has_q = rs.quals_flat is not None
    quals = np.full((plan.rows, plan.patl), 30, np.int8) if has_q else None
    from real_tpu import native
    lib = native.get_lib()
    import ctypes
    u8p = ctypes.POINTER(ctypes.c_uint8)
    u32p = ctypes.POINTER(ctypes.c_uint32)
    for lo in range(0, n, chunk):
        hi = min(lo + chunk, n)
        codes_all, quals_all = rs.dense_batch(plan.patids[lo:hi])
        valid[lo:hi] = (codes_all <= 3).all(axis=1)
        if lib is not None:
            c = np.ascontiguousarray(codes_all)
            out = words[lo:hi]
            lib.pack_rows_2bit(c.ctypes.data_as(u8p), hi - lo,
                               plan.patl, out.ctypes.data_as(u32p), kw)
        else:
            words[lo:hi] = bitpack.pack_rows_2bit(codes_all)
        if has_q:
            quals[lo:hi] = quals_all
    return words, quals, valid


def _to_batch(plan: BatchPlan, words_dev, quals_dev, valid_dev) -> Batch:
    return Batch(patids=plan.patids, patl=plan.patl,
                 codes=_unpack_rows(words_dev, plan.patl),
                 quals=quals_dev, valid=valid_dev)


def _upload(rs: reads_io.ReadSet, plan: BatchPlan,
            host_packed=None) -> Batch:
    words, quals, valid = (host_packed if host_packed is not None
                           else _pack_host(rs, plan))
    return _to_batch(plan, jnp.asarray(words),
                     None if quals is None else jnp.asarray(quals),
                     jnp.asarray(valid))


class BatchSource:
    """Re-iterable batch sequence; resident or streaming (see module doc).

    len() and .plans are cheap host metadata; iteration yields Batches
    with device arrays. `resident_device_bytes` reports the packed bytes
    held on device across passes (0 in streaming mode) so the shard
    planner can reserve them."""

    def __init__(self, rs: reads_io.ReadSet, plans: List[BatchPlan],
                 resident_budget_bytes: int = 1 << 30, prefetch: int = 3):
        self.rs = rs
        self.plans = plans
        self.prefetch = prefetch
        has_q = rs.quals_flat is not None
        total = sum(packed_batch_bytes(p.rows, p.patl, has_q)
                    for p in plans)
        self.resident = total <= resident_budget_bytes
        self.resident_device_bytes = total if self.resident else 0
        self._cache: Optional[List] = None          # packed device slices
        self._host_cache: Dict[int, tuple] = {}     # streaming passes > 1
        self._host_cache_bytes = 0

    def __len__(self) -> int:
        return len(self.plans)

    def __iter__(self) -> Iterator[Batch]:
        if self.resident:
            if self._cache is None:
                self._cache = self._upload_resident()
            return (_to_batch(p, w, q, v) for p, w, q, v in self._cache)
        return self._stream()

    def _upload_resident(self) -> List:
        """One bulk packed transfer per length bucket (per-batch
        transfers are latency-bound on remote/tunneled devices), sliced
        per batch on device. Only the PACKED words persist; uint8 codes
        are re-derived per batch each pass and freed after use."""
        out: List = []
        by_bucket: dict = {}
        for p in self.plans:
            by_bucket.setdefault((p.patl, p.rows), []).append(p)
        for (patl, rows), plans in by_bucket.items():
            ids = np.concatenate([p.patids for p in plans])
            big = BatchPlan(patids=ids, patl=patl, rows=rows * len(plans))
            words, quals, valid = _pack_host(self.rs, big)
            dw = jnp.asarray(words)
            dq = None if quals is None else jnp.asarray(quals)
            dv = jnp.asarray(valid)
            for k, p in enumerate(plans):
                o = k * rows
                out.append((p, dw[o:o + rows],
                            None if dq is None else dq[o:o + rows],
                            dv[o:o + rows]))
        return out

    def _stream(self) -> Iterator[Batch]:
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            try:
                for i, plan in enumerate(self.plans):
                    if stop.is_set():
                        return
                    hp = self._host_cache.get(i)
                    if hp is None:
                        hp = _pack_host(self.rs, plan)
                        nbytes = sum(a.nbytes for a in hp
                                     if a is not None)
                        if self._host_cache_bytes + nbytes \
                                <= _HOST_CACHE_MAX:
                            self._host_cache[i] = hp
                            self._host_cache_bytes += nbytes
                    q.put(_upload(self.rs, plan, host_packed=hp))
                q.put(None)
            except BaseException as e:   # surface in consumer
                q.put(e)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
            # drain so the producer can exit
            while t.is_alive():
                try:
                    q.get_nowait()
                except queue.Empty:
                    break
            t.join(timeout=5)


def make_source(rs: reads_io.ReadSet, batch_size: int, seedl: int,
                patid_filter: Optional[np.ndarray] = None,
                row_align: int = 1, warn=None,
                resident_budget_bytes: int = 1 << 30,
                max_rows: int = 0) -> BatchSource:
    plans = make_plans(rs, batch_size, seedl, patid_filter, row_align, warn,
                       max_rows=max_rows)
    return BatchSource(rs, plans,
                       resident_budget_bytes=resident_budget_bytes)
