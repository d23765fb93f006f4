"""ctypes front-end for the native (C++) parsers in real_tpu/native.

Same semantics as the NumPy parsers in reads.py / fasta.py (the test suite
cross-checks them); used automatically when the shared library builds.
"""

from __future__ import annotations

import ctypes
from typing import List, Optional, Tuple

import numpy as np

from real_tpu import native
from real_tpu.io.reads import IdView, ReadSet, autodetect_quality_offset


def _u8p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _i8p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int8))


def _i64p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def _decode_ids(ids_buf: np.ndarray, id_offsets: np.ndarray) -> List[str]:
    raw = ids_buf.tobytes()
    return [raw[id_offsets[i]:id_offsets[i + 1]].decode("latin-1")
            for i in range(len(id_offsets) - 1)]


def parse_fasta_reads_native(buf: np.ndarray) -> Optional[ReadSet]:
    lib = native.get_lib()
    if lib is None or buf.size == 0:
        return None
    nr = np.zeros(1, np.int64)
    tb = np.zeros(1, np.int64)
    ti = np.zeros(1, np.int64)
    lib.fasta_reads_count(_u8p(buf), buf.size, _i64p(nr), _i64p(tb),
                          _i64p(ti))
    n = int(nr[0])
    codes = np.empty(int(tb[0]), np.uint8)
    offsets = np.zeros(n + 1, np.int64)
    ids_buf = np.empty(int(ti[0]), np.uint8)
    id_offsets = np.zeros(n + 1, np.int64)
    lib.fasta_reads_fill(_u8p(buf), buf.size, _u8p(codes), _i64p(offsets),
                         _u8p(ids_buf), _i64p(id_offsets))
    lengths = np.diff(offsets).astype(np.int32)
    return ReadSet(IdView(ids_buf, id_offsets), lengths, codes,
                   offsets, None, False)


def parse_fastq_native(buf: np.ndarray,
                       quality_offset: int = 0) -> Optional[ReadSet]:
    lib = native.get_lib()
    if lib is None or buf.size == 0:
        return None
    nr = np.zeros(1, np.int64)
    tb = np.zeros(1, np.int64)
    ti = np.zeros(1, np.int64)
    rc = lib.fastq_reads_count(_u8p(buf), buf.size, _i64p(nr), _i64p(tb),
                               _i64p(ti))
    if rc != 0:
        return None   # irregular structure: caller falls back
    n = int(nr[0])
    codes = np.empty(int(tb[0]), np.uint8)
    quals = np.empty(int(tb[0]), np.int8)
    offsets = np.zeros(n + 1, np.int64)
    ids_buf = np.empty(int(ti[0]), np.uint8)
    id_offsets = np.zeros(n + 1, np.int64)
    if quality_offset == 0:
        # autodetect needs raw quality chars; fill with offset 0 first
        rc = lib.fastq_reads_fill(_u8p(buf), buf.size, _u8p(codes),
                                  _i8p(quals), _i64p(offsets),
                                  _u8p(ids_buf), _i64p(id_offsets), 0)
        if rc != 0:
            return None
        quality_offset = autodetect_quality_offset(
            quals.view(np.uint8))
        if quality_offset == 0:
            raise RuntimeError(
                "Unable to automatically detect FastQ quality format.")
        quals = (quals.view(np.uint8).astype(np.int16)
                 - quality_offset).astype(np.int8)
    else:
        rc = lib.fastq_reads_fill(_u8p(buf), buf.size, _u8p(codes),
                                  _i8p(quals), _i64p(offsets),
                                  _u8p(ids_buf), _i64p(id_offsets),
                                  quality_offset)
        if rc != 0:
            return None
    lengths = np.diff(offsets).astype(np.int32)
    return ReadSet(IdView(ids_buf, id_offsets), lengths, codes,
                   offsets, quals, True, quality_offset)


def parse_genome_native(
        buf: np.ndarray
) -> Optional[Tuple[np.ndarray, List[Tuple[str, int]]]]:
    lib = native.get_lib()
    if lib is None or buf.size == 0:
        return None
    tb = np.zeros(1, np.int64)
    nf = np.zeros(1, np.int64)
    ti = np.zeros(1, np.int64)
    lib.genome_count(_u8p(buf), buf.size, _i64p(tb), _i64p(nf), _i64p(ti))
    f = int(nf[0])
    codes = np.empty(int(tb[0]), np.uint8)
    frag_offsets = np.zeros(max(f, 1), np.int64)
    ids_buf = np.empty(int(ti[0]), np.uint8)
    id_offsets = np.zeros(f + 1, np.int64)
    lib.genome_fill(_u8p(buf), buf.size, _u8p(codes), _i64p(frag_offsets),
                    _u8p(ids_buf), _i64p(id_offsets))
    names = _decode_ids(ids_buf, id_offsets)
    ranges = [(names[i], int(frag_offsets[i])) for i in range(f)]
    ranges.append(("terminal", int(tb[0])))
    return codes, ranges
