"""End-to-end matching drivers (matchUnique / matchAll).

Loop structure mirrors the reference
(matchUniqueImplementation.cpp:1082-1489):

    for each text file:                 (getFileList, ".fa" suffix)
      build packed text + fragment ranges
      for each index shard (block):     (memory-bounded block streaming)
        build sorted signature lists    (device, lax.sort)
        for each read length-bucket batch:
          match_step(...)               (jitted; state persists per read)
    final pass: format records in read order

Per-read best-hit state lives on device across files and shards, exactly
like the reference's single uniqueinfo array
(matchUniqueImplementation.cpp:1097). Candidate/survivor overflow (capped
data-dependent candidate counts) is detected per read and those reads are
re-run from scratch with escalated caps — the fixed-shape answer to
std::equal_range's unbounded hit ranges.
"""

from __future__ import annotations

import dataclasses
import functools
import sys
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from real_tpu.config import RealConfig
from real_tpu.engine import matchstep
from real_tpu.engine.matchstep import MatchState, initial_state, \
    match_step, null_score_prep
from real_tpu.index.build import build_index
from real_tpu.io import fasta, reads as reads_io
from real_tpu.scoring.scoring import Scoring, make_score_prep
from real_tpu.text.packed import PackedText, build_packed_text

_REMAP = np.frombuffer(b"ACGTN", dtype=np.uint8)
MAX_FRAGMENTS_PER_FILE = 1 << 16   # UniqueMatchInfo fragmentbits


def default_score_mode() -> str:
    """'f64' where the backend supports doubles (CPU — exact reference
    math), 'ff' (two-float) on TPU."""
    if jax.default_backend() == "cpu" and jax.config.jax_enable_x64:
        return "f64"
    return "ff"


@dataclasses.dataclass
class TextFile:
    name: str
    packed: PackedText


def load_texts(cfg: RealConfig) -> List[TextFile]:
    """-t may be a file or a directory of *.fa files (getFileList.cpp)."""
    import os
    paths: List[str] = []
    if os.path.isdir(cfg.textfilename):
        for root, _dirs, files in sorted(os.walk(cfg.textfilename)):
            for f in sorted(files):
                if f.endswith(".fa"):
                    paths.append(os.path.join(root, f))
    else:
        paths.append(cfg.textfilename)
    out = []
    for p in paths:
        codes, ranges = fasta.parse_genome(p)
        out.append(TextFile(name=p, packed=build_packed_text(codes, ranges)))
    return out


def _build(cfg: RealConfig, text: PackedText, start: int, num_windows: int):
    if cfg.device_index_build:
        return build_index(text, cfg.seedl, start=start,
                           num_windows=num_windows)
    from real_tpu.index.hostbuild import build_index_host
    return build_index_host(text, cfg.seedl, start=start,
                            num_windows=num_windows)


def _shard_bounds(num_windows: int, num_shards: int) -> List[Tuple[int, int]]:
    from real_tpu.index.hostbuild import _round16
    per = _round16(-(-num_windows // num_shards))
    return [(s, min(s + per, num_windows))
            for s in range(0, num_windows, per)]


@dataclasses.dataclass
class MatchResult:
    """Final per-read state (host)."""
    st: np.ndarray
    pos: np.ndarray
    frag: np.ndarray
    fileid: np.ndarray
    errs: np.ndarray
    score: np.ndarray


def run_match_unique(cfg: RealConfig, rs: reads_io.ReadSet,
                     texts: List[TextFile],
                     score_mode: Optional[str] = None,
                     patid_filter: Optional[np.ndarray] = None,
                     cand_cap: Optional[int] = None,
                     survivor_cap: Optional[int] = None,
                     _depth: int = 0) -> MatchResult:
    score_mode = score_mode or default_score_mode()
    cand_cap = cand_cap or cfg.cand_cap
    survivor_cap = survivor_cap or cfg.survivor_cap
    numpat = rs.num_reads

    scoring = Scoring(cfg.similarity, cfg.gc, cfg.trans, cfg.err,
                      cfg.gcmut_bias)
    prep_fn = make_score_prep(scoring) if cfg.scores else None

    result = MatchResult(
        st=np.zeros(numpat, np.int32), pos=np.zeros(numpat, np.int32),
        frag=np.zeros(numpat, np.int32), fileid=np.zeros(numpat, np.int32),
        errs=np.zeros(numpat, np.int32),
        score=np.full(numpat, -np.finfo(np.float32).max, np.float32))

    batches = _make_batches(cfg, rs, patid_filter)
    states: Dict[int, MatchState] = {
        bi: initial_state(b.codes.shape[0]) for bi, b in enumerate(batches)}
    preps = [prep_fn(b.codes, b.quals) if cfg.scores
             else null_score_prep(b.codes.shape[0], b.patl)
             for b in batches]
    overflow = np.zeros(numpat, bool)
    overflows: Dict[int, list] = {}

    for fi, tf in enumerate(texts):
        text = tf.packed
        if text.n < cfg.seedl:
            print(f"File {tf.name} is too small for seed length, "
                  "skipping it.", file=sys.stderr)
            continue
        if text.num_fragments > MAX_FRAGMENTS_PER_FILE:
            print(f"Number of fragments {text.num_fragments + 1} in file is "
                  "larger than limit we can handle, skipping it.",
                  file=sys.stderr)
            continue
        num_windows = text.n - cfg.seedl + 1
        for (s, e) in _shard_bounds(num_windows, cfg.index_shards):
            index = _build(cfg, text, start=s, num_windows=e - s)
            for bi, b in enumerate(batches):
                eps = np.float32(cfg.filter_value(b.patl))
                states[bi], surv = match_step(
                    index.sig, index.comp, index.pos, index.bb,
                    text.words, text.nbits, text.ncum, text.frag_offsets,
                    b.codes, b.quals, b.valid,
                    states[bi], jnp.int32(fi), eps, preps[bi],
                    seedl=cfg.seedl, seedkmax=cfg.seedkmax,
                    totalkmax=cfg.totalkmax, cand_cap=cand_cap,
                    survivor_cap=survivor_cap, scores=cfg.scores,
                    score_mode=score_mode, matchall=False)
                overflows.setdefault(bi, []).append(surv.overflow)

    # one D2H round-trip for everything: concatenate per-batch state and
    # overflow on device, fetch once
    allst = _concat_states([states[bi] for bi in range(len(batches))])
    allover = [functools.reduce(jnp.logical_or, overflows[bi])
               if bi in overflows else jnp.zeros(
                   batches[bi].codes.shape[0], bool)
               for bi in range(len(batches))]
    allover = jnp.concatenate(allover) if allover else jnp.zeros(0, bool)
    st = jax.tree.map(np.asarray, allst)
    over = np.asarray(allover)
    off = 0
    for bi, b in enumerate(batches):
        rows = b.codes.shape[0]
        n = len(b.patids)
        result.st[b.patids] = st.st[off:off + n]
        result.pos[b.patids] = st.pos[off:off + n]
        result.frag[b.patids] = st.frag[off:off + n]
        result.fileid[b.patids] = st.fileid[off:off + n]
        result.errs[b.patids] = st.errs[off:off + n]
        result.score[b.patids] = st.score[off:off + n]
        overflow[b.patids[over[off:off + n]]] = True
        off += rows

    over_ids = np.flatnonzero(overflow)
    if len(over_ids):
        if _depth >= 4:
            raise RuntimeError(
                f"{len(over_ids)} reads overflow candidate caps even at "
                f"cand_cap={cand_cap}")
        print(f"rerunning {len(over_ids)} overflowing reads with "
              f"cand_cap={cand_cap * 4}", file=sys.stderr)
        sub = run_match_unique(
            cfg, rs, texts, score_mode=score_mode, patid_filter=over_ids,
            cand_cap=cand_cap * 4, survivor_cap=survivor_cap * 4,
            _depth=_depth + 1)
        for f in ("st", "pos", "frag", "fileid", "errs", "score"):
            getattr(result, f)[over_ids] = getattr(sub, f)[over_ids]
    return result


@dataclasses.dataclass
class Batch:
    patids: np.ndarray     # int64 [n] (n <= B)
    patl: int
    codes: jnp.ndarray     # uint8 [B, patl] (padded rows zero)
    quals: jnp.ndarray     # int8  [B, patl]
    valid: jnp.ndarray     # bool  [B]


def _make_batches(cfg: RealConfig, rs: reads_io.ReadSet,
                  patid_filter: Optional[np.ndarray]) -> List[Batch]:
    batches: List[Batch] = []
    warned_short = False
    for patl, patids in sorted(rs.length_buckets().items()):
        if patid_filter is not None:
            patids = patids[np.isin(patids, patid_filter)]
            if len(patids) == 0:
                continue
        if patl < cfg.seedl:
            if not warned_short:
                print(f"Skipping {len(patids)} patterns shorter than seed "
                      "length.", file=sys.stderr)
                warned_short = True
            continue
        codes_all, quals_all = rs.dense_batch(patids)
        if quals_all is None:
            quals_all = np.full_like(codes_all, 30, dtype=np.int8)
        valid_all = (codes_all <= 3).all(axis=1)
        B = cfg.batch_size
        # one device shape per length bucket: tail batches pad to the same
        # row count as full batches (jit compiles once per bucket).
        # Upload the whole bucket in ONE host->device transfer (padded to a
        # batch multiple), then slice per batch on device — per-batch
        # transfers are latency-bound on remote/tunneled devices.
        bucket_rows = B if len(patids) > B else _round_b(len(patids), B)
        nb = -(-len(patids) // bucket_rows)
        rows = nb * bucket_rows
        n = len(patids)
        codes = np.zeros((rows, patl), np.uint8)
        quals = np.full((rows, patl), 30, np.int8)
        valid = np.zeros(rows, bool)
        codes[:n] = codes_all & 3   # codes 4 (N) masked via valid
        quals[:n] = quals_all
        valid[:n] = valid_all
        dcodes = jnp.asarray(codes)
        dquals = jnp.asarray(quals)
        dvalid = jnp.asarray(valid)
        for k in range(nb):
            o = k * bucket_rows
            ids = patids[o:o + bucket_rows]
            batches.append(Batch(
                patids=ids, patl=patl,
                codes=dcodes[o:o + bucket_rows],
                quals=dquals[o:o + bucket_rows],
                valid=dvalid[o:o + bucket_rows]))
    return batches


@jax.jit
def _concat_states(states: List[MatchState]) -> MatchState:
    return jax.tree.map(lambda *xs: jnp.concatenate(xs), *states)


def _round_b(n: int, bmax: int) -> int:
    """Pad batch rows to the next power of two (limits jit retraces)."""
    b = 1
    while b < n:
        b *= 2
    return min(b, bmax)


# ---------------------------------------------------------------------------
# matchAll
# ---------------------------------------------------------------------------

def run_match_all(cfg: RealConfig, rs: reads_io.ReadSet,
                  texts: List[TextFile],
                  score_mode: Optional[str] = None,
                  patid_filter: Optional[np.ndarray] = None,
                  cand_cap: Optional[int] = None,
                  survivor_cap: Optional[int] = None,
                  _depth: int = 0) -> Dict[int, List[tuple]]:
    """Collect every qualifying hit per read.

    Returns {patid: [(k, pos, fileid, frag, score, inverted), ...]} deduped
    and sorted by the reference's MatchPosAndError ordering
    (matchAllImplementation.cpp:121-160)."""
    score_mode = score_mode or default_score_mode()
    cand_cap = cand_cap or cfg.cand_cap
    survivor_cap = survivor_cap or cfg.survivor_cap

    scoring = Scoring(cfg.similarity, cfg.gc, cfg.trans, cfg.err,
                      cfg.gcmut_bias)
    prep_fn = make_score_prep(scoring) if cfg.scores else None

    batches = _make_batches(cfg, rs, patid_filter)
    hits: Dict[int, List[tuple]] = {}
    overflow = np.zeros(rs.num_reads, bool)
    dummy_states = {bi: initial_state(b.codes.shape[0])
                    for bi, b in enumerate(batches)}
    preps = [prep_fn(b.codes, b.quals) if cfg.scores
             else null_score_prep(b.codes.shape[0], b.patl)
             for b in batches]

    for fi, tf in enumerate(texts):
        text = tf.packed
        if text.n < cfg.seedl or text.num_fragments > MAX_FRAGMENTS_PER_FILE:
            continue
        num_windows = text.n - cfg.seedl + 1
        for (s, e) in _shard_bounds(num_windows, cfg.index_shards):
            index = _build(cfg, text, start=s, num_windows=e - s)
            for bi, b in enumerate(batches):
                eps = np.float32(cfg.filter_value(b.patl))
                _, surv = match_step(
                    index.sig, index.comp, index.pos, index.bb,
                    text.words, text.nbits, text.ncum, text.frag_offsets,
                    b.codes, b.quals, b.valid,
                    dummy_states[bi], jnp.int32(fi), eps, preps[bi],
                    seedl=cfg.seedl, seedkmax=cfg.seedkmax,
                    totalkmax=cfg.totalkmax, cand_cap=cand_cap,
                    survivor_cap=survivor_cap, scores=cfg.scores,
                    score_mode=score_mode, matchall=True)
                sv = jax.tree.map(np.asarray, surv)
                n = len(b.patids)
                overflow[b.patids[sv.overflow[:n]]] = True
                for r in range(n):
                    mask = sv.valid[r]
                    if not mask.any():
                        continue
                    pid = int(b.patids[r])
                    lst = hits.setdefault(pid, [])
                    for j in np.flatnonzero(mask):
                        lst.append((int(sv.k[r, j]), int(sv.pos[r, j]),
                                    fi, int(sv.frag[r, j]),
                                    float(sv.score[r, j]),
                                    bool(sv.inv[r, j])))

    over_ids = np.flatnonzero(overflow)
    if len(over_ids):
        if _depth >= 4:
            raise RuntimeError("matchAll overflow beyond escalation limit")
        sub = run_match_all(cfg, rs, texts, score_mode=score_mode,
                            patid_filter=over_ids, cand_cap=cand_cap * 4,
                            survivor_cap=survivor_cap * 4, _depth=_depth + 1)
        for pid in over_ids:
            hits[int(pid)] = sub.get(int(pid), [])

    # unify: sort + dedup (matchAllImplementation.cpp:148-161)
    out: Dict[int, List[tuple]] = {}
    for pid, lst in hits.items():
        key = lambda h: (h[0], h[1], h[2], h[3], h[4], h[5])
        lst = sorted(set(lst), key=key)
        out[pid] = lst
    return out
