"""Byte-identical output record formatting.

Record layout (matchUniqueImplementation.cpp:265-291,
matchAllImplementation.cpp:481-517), tab separated:

  read_id  seq[matched orientation]  [score]  1  a  patl  +/-  fragment_id
  1-based-position-in-fragment  <empty>  num_mismatches

Scores are printed as C++ `ostream << float` (general format, 6 significant
digits) == Python '%.6g' of the float32 value widened to double.

Formatting is fully vectorized (NumPy bytes columns + np.char.add): the
reference's output pass is a C++ stream loop
(matchUniqueImplementation.cpp:1438-1488); a per-read Python loop would
dominate wall-clock at 1M+ reads.
"""

from __future__ import annotations

from typing import Dict, IO, List, Tuple

import numpy as np

from real_tpu.engine.driver import MatchResult, TextFile
from real_tpu.engine.matchstep import REVERSE, STRAIGHT
from real_tpu.io.reads import ReadSet, reverse_complement

_REMAP = np.frombuffer(b"ACGTN", dtype=np.uint8)


def format_score(x: float) -> str:
    """C++ default ostream float formatting (6 significant digits)."""
    return f"{float(np.float32(x)):.6g}"


def _write_bytes(out: IO, blob: bytes) -> None:
    buf = getattr(out, "buffer", None)
    if buf is not None:
        buf.write(blob)
    else:
        try:
            out.write(blob)
        except TypeError:
            out.write(blob.decode("latin-1"))


def _frag_tables(texts: List[TextFile]):
    """Per-file (names S-array, offsets int64 array) lookup tables."""
    names, offs = [], []
    for tf in texts:
        r = tf.packed.ranges
        names.append(np.array([nm.encode("latin-1") for nm, _ in r]))
        offs.append(np.array([off for _, off in r], dtype=np.int64))
    return names, offs


def _seq_column(codes_mat: np.ndarray, inv: np.ndarray) -> np.ndarray:
    """[n, L] codes + strand -> S-array of sequence strings in matched
    orientation (reverse complement for '-' hits)."""
    n, L = codes_mat.shape
    # N (code 4) maps to N, not 3-4 (reads.reverse_complement semantics);
    # N-containing reads are normally masked invalid before matching, but
    # the formatter must not crash if one ever reaches it
    rc = reverse_complement(codes_mat)
    sel = np.where(inv[:, None], rc, codes_mat)
    return np.frombuffer(_REMAP[sel].tobytes(), dtype=f"S{L}")


def _gather_codes(rs: ReadSet, pids: np.ndarray, L: int) -> np.ndarray:
    idx = (rs.offsets[pids][:, None]
           + np.arange(L, dtype=np.int64)[None, :])
    return rs.codes_flat[idx]


def _int_col(a: np.ndarray) -> np.ndarray:
    return np.char.mod(b"%d", a.astype(np.int64))


def _score_col(a: np.ndarray) -> np.ndarray:
    return np.char.mod(b"%.6g", a.astype(np.float32).astype(np.float64))


def _join_records(cols: List[np.ndarray]) -> bytes:
    """Tab-join byte columns into newline-terminated records."""
    tab = np.array(b"\t")
    rec = cols[0]
    for c in cols[1:]:
        rec = np.char.add(np.char.add(rec, tab), c)
    if len(rec) == 0:
        return b""
    return b"\n".join(rec.tolist()) + b"\n"


def _global_frag_tables(texts: List[TextFile]):
    """Concatenated fragment-name blob across files: (name_blob uint8,
    name_off int64 [F+1], file_base int64 per file, frag_start int64
    aligned with the global name index)."""
    parts, starts, bases = [], [], []
    total = 0
    for tf in texts:
        r = tf.packed.ranges
        for nm, off in r[:-1]:
            parts.append(nm.encode("latin-1"))
            starts.append(off)
        bases.append(total)
        total += len(r) - 1
    name_off = np.zeros(len(parts) + 1, np.int64)
    np.cumsum([len(b) for b in parts], out=name_off[1:])
    blob = np.frombuffer(b"".join(parts), np.uint8) if parts \
        else np.zeros(0, np.uint8)
    return (blob, name_off, np.asarray(bases, np.int64),
            np.asarray(starts, np.int64))


def _format_records_native(rs: ReadSet, pids, inv, fileid, frag, pos,
                           errs, score, texts, scores: bool):
    """C++ formatter (native/readpack.cpp format_records); returns None
    when unavailable (non-IdView ids or no native lib)."""
    from real_tpu import native
    lib = native.get_lib()
    ids = rs.ids
    if lib is None or not hasattr(ids, "blob"):
        return None
    blob, name_off, file_base, frag_start = _global_frag_tables(texts)
    name_idx = file_base[fileid.astype(np.int64)] + frag.astype(np.int64)
    local_pos = pos.astype(np.int64) - frag_start[name_idx] + 1
    import ctypes

    def i64(a):
        return np.ascontiguousarray(a, np.int64)

    def p(a, t):
        return a.ctypes.data_as(ctypes.POINTER(t))

    n = pids.size
    pid64 = i64(pids)
    id_off = i64(ids.off)
    code_off = i64(rs.offsets)
    ni = i64(name_idx)
    cap = lib.format_records_bound(n, p(pid64, ctypes.c_int64),
                                   p(id_off, ctypes.c_int64),
                                   p(code_off, ctypes.c_int64),
                                   p(ni, ctypes.c_int64),
                                   p(name_off, ctypes.c_int64))
    out = np.empty(int(cap), np.uint8)
    inv8 = np.ascontiguousarray(inv, np.uint8)
    sc = np.ascontiguousarray(score, np.float32) if scores else None
    errs32 = np.ascontiguousarray(errs, np.int32)
    lp = i64(local_pos)
    nb = np.ascontiguousarray(blob)
    written = lib.format_records(
        n, p(np.ascontiguousarray(ids.blob), ctypes.c_uint8),
        p(id_off, ctypes.c_int64),
        p(np.ascontiguousarray(rs.codes_flat), ctypes.c_uint8),
        p(code_off, ctypes.c_int64),
        p(pid64, ctypes.c_int64), p(inv8, ctypes.c_uint8),
        p(sc, ctypes.c_float) if sc is not None
        else ctypes.POINTER(ctypes.c_float)(),
        p(nb, ctypes.c_uint8), p(name_off, ctypes.c_int64),
        p(ni, ctypes.c_int64), p(lp, ctypes.c_int64),
        p(errs32, ctypes.c_int32),
        p(out, ctypes.c_uint8), out.size)
    if written < 0:
        return None
    return out[:written].tobytes()


def _format_records(rs: ReadSet, pids: np.ndarray, inv: np.ndarray,
                    fileid: np.ndarray, frag: np.ndarray, pos: np.ndarray,
                    errs: np.ndarray, score: np.ndarray,
                    texts: List[TextFile], scores: bool) -> bytes:
    """Vectorized record lines for hits (pids may repeat for matchAll);
    rows are emitted in the given order."""
    if pids.size == 0:
        return b""
    nat = _format_records_native(rs, pids, inv, fileid, frag, pos, errs,
                                 score, texts, scores)
    if nat is not None:
        return nat
    names, offs = _frag_tables(texts)
    n = pids.size

    ids = rs.ids
    if hasattr(ids, "bytes_at"):
        id_col = np.array([ids.bytes_at(p) for p in pids.tolist()])
    else:
        id_col = np.array([ids[p].encode("latin-1") for p in pids.tolist()])

    seq_col = np.empty(n, dtype=object)
    lens = rs.lengths[pids]
    for L in np.unique(lens):
        m = lens == L
        seq_col[m] = _seq_column(_gather_codes(rs, pids[m], int(L)), inv[m])

    frag_name = np.empty(n, dtype=object)
    local_pos = np.empty(n, dtype=np.int64)
    for fi in np.unique(fileid):
        m = fileid == fi
        frag_name[m] = names[fi][frag[m]]
        local_pos[m] = pos[m].astype(np.int64) - offs[fi][frag[m]] + 1

    score_col = (_score_col(score) if scores
                 else np.full(n, b"", dtype="S1"))
    strand = np.where(inv, np.array(b"-"), np.array(b"+"))
    ones = np.full(n, b"1", dtype="S1")
    a_col = np.full(n, b"a", dtype="S1")
    empty = np.full(n, b"", dtype="S1")

    return _join_records([
        id_col, seq_col.astype(bytes), score_col, ones, a_col,
        _int_col(lens), strand, frag_name.astype(bytes),
        _int_col(local_pos), empty, _int_col(errs)])


_CHUNK_RECORDS = 1 << 18


def _emit_chunks(out: IO, make_blob, n: int,
                 chunk: int = _CHUNK_RECORDS) -> None:
    """Stream formatted records in bounded chunks through TWO formatter
    threads and a writer thread (the AsynchronousWriter.hpp:82
    analogue): the native formatter is a ctypes call that releases the
    GIL, so two chunks format concurrently (~1 us/record single-thread
    — 51 s alone at the 48M-record Drosophila output), the writer
    overlaps the disk, and host RAM holds a bounded number of chunk
    blobs instead of the whole output file. Blob order is preserved
    (FIFO futures)."""
    if n <= chunk:
        _write_bytes(out, make_blob(0, n))
        return
    import collections
    import queue
    import threading
    from concurrent.futures import ThreadPoolExecutor
    q: "queue.Queue" = queue.Queue(maxsize=2)

    def writer():
        while True:
            b = q.get()
            if b is None:
                return
            _write_bytes(out, b)

    t = threading.Thread(target=writer)
    t.start()
    try:
        with ThreadPoolExecutor(max_workers=2) as ex:
            pending = collections.deque()
            for s in range(0, n, chunk):
                pending.append(ex.submit(make_blob, s, min(s + chunk, n)))
                while len(pending) > 3:
                    q.put(pending.popleft().result())
            while pending:
                q.put(pending.popleft().result())
    finally:
        q.put(None)
        t.join()


def write_unique(out: IO, rs: ReadSet, result: MatchResult,
                 texts: List[TextFile], scores: bool) -> int:
    """Final output pass in read order; returns the unique-hit count
    (printed as 'unique: N' on stderr by the CLI)."""
    pids = np.flatnonzero((result.st == STRAIGHT) | (result.st == REVERSE))

    def make_blob(s, e):
        p = pids[s:e]
        return _format_records(
            rs, p, result.st[p] == REVERSE, result.fileid[p],
            result.frag[p], result.pos[p], result.errs[p],
            result.score[p], texts, scores)

    _emit_chunks(out, make_blob, pids.size)
    return int(pids.size)


def write_all_arrays(out: IO, rs: ReadSet, cols, texts: List[TextFile],
                     scores: bool) -> int:
    """matchAll output from the accumulator's sorted/deduped column arrays
    (driver.run_match_all(as_arrays=True)). The reference's ordering is
    thread-interleaved and nondeterministic
    (matchAllImplementation.cpp:467-533); we print read-major, hits per
    read in unified (sorted) order — compare as record sets."""
    pid, k, pos, fid, frag, score, inv = cols

    def make_blob(s, e):
        return _format_records(
            rs, pid[s:e], inv[s:e].astype(bool),
            fid[s:e].astype(np.int64), frag[s:e].astype(np.int64),
            pos[s:e], k[s:e], score[s:e], texts, scores)

    _emit_chunks(out, make_blob, len(pid))
    return int(pid.size)


def write_all(out: IO, rs: ReadSet,
              hits: Dict[int, List[Tuple]], texts: List[TextFile],
              scores: bool) -> int:
    """matchAll output from the {patid: [(k, pos, fileid, frag, score,
    inverted), ...]} dict form (small runs / tests)."""
    npid = sum(len(v) for v in hits.values())
    cols = [np.empty(npid, np.int64) for _ in range(5)] \
        + [np.empty(npid, np.float32), np.empty(npid, bool)]
    i = 0
    for pid in sorted(hits):
        for (k, pos, fileid, frag, score, inverted) in hits[pid]:
            for c, v in zip(cols, (pid, k, pos, fileid, frag, score,
                                   inverted)):
                c[i] = v
            i += 1
    return write_all_arrays(out, rs, tuple(cols), texts, scores)
