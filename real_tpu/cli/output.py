"""Byte-identical output record formatting.

Record layout (matchUniqueImplementation.cpp:265-291,
matchAllImplementation.cpp:481-517), tab separated:

  read_id  seq[matched orientation]  [score]  1  a  patl  +/-  fragment_id
  1-based-position-in-fragment  <empty>  num_mismatches

Scores are printed as C++ `ostream << float` (general format, 6 significant
digits) == Python '%.6g' of the float32 value widened to double.
"""

from __future__ import annotations

from typing import Dict, IO, List, Tuple

import numpy as np

from real_tpu.engine.driver import MatchResult, TextFile
from real_tpu.engine.matchstep import REVERSE, STRAIGHT
from real_tpu.io.reads import ReadSet, reverse_complement

_REMAP = np.frombuffer(b"ACGTN", dtype=np.uint8)


def _seq_str(codes: np.ndarray) -> str:
    return _REMAP[codes].tobytes().decode("ascii")


def format_score(x: float) -> str:
    """C++ default ostream float formatting (6 significant digits)."""
    return f"{float(np.float32(x)):.6g}"


def write_unique(out: IO[str], rs: ReadSet, result: MatchResult,
                 texts: List[TextFile], scores: bool) -> int:
    """Final output pass in read order; returns the unique-hit count
    (printed as 'unique: N' on stderr by the CLI)."""
    unique = 0
    for pid in range(rs.num_reads):
        st = result.st[pid]
        if st != STRAIGHT and st != REVERSE:
            continue
        codes = rs.codes(pid)
        seq = _seq_str(codes if st == STRAIGHT
                       else reverse_complement(codes))
        ranges = texts[result.fileid[pid]].packed.ranges
        frag_name, frag_off = ranges[result.frag[pid]]
        score_field = format_score(result.score[pid]) if scores else ""
        out.write(
            f"{rs.ids[pid]}\t{seq}\t{score_field}\t1\ta\t{len(codes)}\t"
            f"{'+' if st == STRAIGHT else '-'}\t{frag_name}\t"
            f"{int(result.pos[pid]) - frag_off + 1}\t\t"
            f"{int(result.errs[pid])}\n")
        unique += 1
    return unique


def write_all(out: IO[str], rs: ReadSet,
              hits: Dict[int, List[Tuple]], texts: List[TextFile],
              scores: bool) -> int:
    """matchAll output. The reference's ordering is thread-interleaved and
    nondeterministic (matchAllImplementation.cpp:467-533); we print in read
    order, hits per read in unified (sorted) order — compare as record
    sets against the reference."""
    total = 0
    for pid in range(rs.num_reads):
        lst = hits.get(pid)
        if not lst:
            continue
        codes = rs.codes(pid)
        seq_f = _seq_str(codes)
        seq_r = _seq_str(reverse_complement(codes))
        for (k, pos, fileid, frag, score, inverted) in lst:
            ranges = texts[fileid].packed.ranges
            frag_name, frag_off = ranges[frag]
            score_field = format_score(score) if scores else ""
            out.write(
                f"{rs.ids[pid]}\t{seq_r if inverted else seq_f}\t"
                f"{score_field}\t1\ta\t{len(codes)}\t"
                f"{'-' if inverted else '+'}\t{frag_name}\t"
                f"{pos - frag_off + 1}\t\t{k}\n")
            total += 1
    return total
