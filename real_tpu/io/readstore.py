"""Cached length-bucketed packed read store.

TPU equivalent of the reference's binary pattern rewrite (-R 1 default:
TemporaryFile.hpp / ReorderFastA.hpp / ReorderFastQ.hpp): the read file is
parsed once and cached as dense per-length NumPy arrays (codes, qualities,
ids, patids) in an .npz next to the input, so repeated runs (and the
re-streaming of reads per index shard) skip text parsing entirely.

Unlike the reference's format (2-bit for N-free reads, 4-bit otherwise,
TemporaryFile.hpp:208-268) we store flat uint8 codes — host RAM is not the
constraint here and dense batches feed `dense_batch` directly.
"""

from __future__ import annotations

import hashlib
import os
from typing import Optional

import numpy as np

from real_tpu.io.reads import IdView, ReadSet

STORE_VERSION = 2


def _store_path(path: str) -> str:
    st = os.stat(path)
    key = hashlib.sha1(
        f"{os.path.abspath(path)}-{st.st_size}-{st.st_mtime_ns}-"
        f"{STORE_VERSION}".encode()).hexdigest()[:16]
    return os.path.join(os.path.dirname(os.path.abspath(path)),
                        f".{os.path.basename(path)}.{key}.realstore.npz")


def save(rs: ReadSet, path: str) -> str:
    store = _store_path(path)
    ids = (rs.ids if isinstance(rs.ids, IdView)
           else IdView.from_strings(list(rs.ids)))
    np.savez(store,
             lengths=rs.lengths, codes_flat=rs.codes_flat,
             offsets=rs.offsets,
             quals_flat=(rs.quals_flat if rs.quals_flat is not None
                         else np.zeros(0, np.int8)),
             has_quals=np.array([rs.quals_flat is not None]),
             fastq=np.array([rs.fastq]),
             quality_offset=np.array([rs.quality_offset]),
             ids_blob=ids.blob, ids_off=ids.off)
    return store


def load(path: str) -> Optional[ReadSet]:
    store = _store_path(path)
    if not os.path.exists(store):
        return None
    try:
        z = np.load(store)
        return ReadSet(
            ids=IdView(z["ids_blob"], z["ids_off"]),
            lengths=z["lengths"], codes_flat=z["codes_flat"],
            offsets=z["offsets"],
            quals_flat=z["quals_flat"] if bool(z["has_quals"][0]) else None,
            fastq=bool(z["fastq"][0]),
            quality_offset=int(z["quality_offset"][0]))
    except Exception:
        return None


def parse_reads_cached(path: str, quality_offset: int = 0,
                       rewrite: bool = True) -> ReadSet:
    """parse_reads with on-disk caching (-R semantics; stdin never cached)."""
    from real_tpu.io.reads import parse_reads
    if path == "-" or not rewrite:
        return parse_reads(path, quality_offset)
    rs = load(path)
    if rs is not None and (quality_offset in (0, rs.quality_offset)):
        return rs
    rs = parse_reads(path, quality_offset)
    try:
        save(rs, path)
    except OSError:
        pass   # read-only dir: cache is best-effort
    return rs
