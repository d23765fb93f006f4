"""Native (C++) host pipeline, loaded via ctypes.

Build: `make -C real_tpu/native` (or import triggers an on-demand g++
build). Falls back to the NumPy parsers in real_tpu.io when unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
from typing import Optional

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libreadpack.so")
_SRC = os.path.join(_DIR, "readpack.cpp")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def build() -> bool:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
           "-o", _SO, _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        sys.stderr.write(f"native build failed: {e}\n")
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO) or (
            os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
        if not build():
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError as e:
        sys.stderr.write(f"native load failed: {e}\n")
        return None
    i64p = ctypes.POINTER(ctypes.c_int64)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i8p = ctypes.POINTER(ctypes.c_int8)
    u32p = ctypes.POINTER(ctypes.c_uint32)
    lib.fasta_reads_count.argtypes = [u8p, ctypes.c_int64, i64p, i64p, i64p]
    lib.fasta_reads_fill.argtypes = [u8p, ctypes.c_int64, u8p, i64p, u8p,
                                     i64p]
    lib.fastq_reads_count.argtypes = [u8p, ctypes.c_int64, i64p, i64p, i64p]
    lib.fastq_reads_count.restype = ctypes.c_int
    lib.fastq_reads_fill.argtypes = [u8p, ctypes.c_int64, u8p, i8p, i64p,
                                     u8p, i64p, ctypes.c_int32]
    lib.fastq_reads_fill.restype = ctypes.c_int
    lib.genome_count.argtypes = [u8p, ctypes.c_int64, i64p, i64p, i64p]
    lib.genome_fill.argtypes = [u8p, ctypes.c_int64, u8p, i64p, u8p, i64p]
    lib.pack_rows_2bit.argtypes = [u8p, ctypes.c_int64, ctypes.c_int64,
                                   u32p, ctypes.c_int64]
    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.format_records_bound.argtypes = [ctypes.c_int64, i64p, i64p, i64p,
                                         i64p, i64p]
    lib.format_records_bound.restype = ctypes.c_int64
    lib.format_records.argtypes = [ctypes.c_int64, u8p, i64p, u8p, i64p,
                                   i64p, u8p, f32p, u8p, i64p, i64p, i64p,
                                   i32p, u8p, ctypes.c_int64]
    lib.format_records.restype = ctypes.c_int64
    u64p = ctypes.POINTER(ctypes.c_uint64)
    lib.radix_argsort3.argtypes = [ctypes.c_int64, u64p, u64p, u64p, i64p]
    _lib = lib
    return _lib
