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

STORE_VERSION = 3


def _store_path(path: str) -> str:
    st = os.stat(path)
    key = hashlib.sha1(
        f"{os.path.abspath(path)}-{st.st_size}-{st.st_mtime_ns}-"
        f"{STORE_VERSION}".encode()).hexdigest()[:16]
    return os.path.join(os.path.dirname(os.path.abspath(path)),
                        f".{os.path.basename(path)}.{key}.realstore")


_ARRAYS = ("lengths", "codes_flat", "offsets", "quals_flat",
           "ids_blob", "ids_off")


def save(rs: ReadSet, path: str) -> str:
    """One raw .npy per array in a store DIRECTORY (version 3). The npz
    container measured 50 s to reopen at 50M reads (6.5 GB through the
    zip layer); raw .npy files load as memmaps instantly and page in on
    first touch, overlapping the match loop."""
    store = _store_path(path)
    os.makedirs(store, exist_ok=True)
    ids = (rs.ids if isinstance(rs.ids, IdView)
           else IdView.from_strings(list(rs.ids)))
    arrays = dict(lengths=rs.lengths, codes_flat=rs.codes_flat,
                  offsets=rs.offsets,
                  quals_flat=(rs.quals_flat if rs.quals_flat is not None
                              else np.zeros(0, np.int8)),
                  ids_blob=ids.blob, ids_off=ids.off)
    for name, a in arrays.items():
        np.save(os.path.join(store, name + ".npy"), a)
    np.savez(os.path.join(store, "meta.npz"),
             has_quals=np.array([rs.quals_flat is not None]),
             fastq=np.array([rs.fastq]),
             quality_offset=np.array([rs.quality_offset]))
    # the meta file doubles as the completion marker (written last)
    return store


def load(path: str) -> Optional[ReadSet]:
    store = _store_path(path)
    meta_p = os.path.join(store, "meta.npz")
    if not os.path.exists(meta_p):
        return None
    try:
        meta = np.load(meta_p)
        z = {name: np.load(os.path.join(store, name + ".npy"),
                           mmap_mode="r") for name in _ARRAYS}
        return ReadSet(
            ids=IdView(z["ids_blob"], z["ids_off"]),
            lengths=z["lengths"], codes_flat=z["codes_flat"],
            offsets=z["offsets"],
            quals_flat=z["quals_flat"] if bool(meta["has_quals"][0])
            else None,
            fastq=bool(meta["fastq"][0]),
            quality_offset=int(meta["quality_offset"][0]))
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
