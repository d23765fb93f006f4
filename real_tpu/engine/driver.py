"""End-to-end matching drivers (matchUnique / matchAll).

Loop structure mirrors the reference
(matchUniqueImplementation.cpp:1082-1489):

    for each text file:                 (getFileList, ".fa" suffix)
      build packed text + fragment ranges
      plan index shards from the -f HBM budget (plan.py ~ :1208-1244)
      for each shard pass:              (memory-bounded block streaming)
        build sorted signature lists    (device, lax.sort)
        for each read length-bucket batch:
          match_step(...)               (jitted; state persists per read)
    final pass: format records in read order

With more than one device the per-pass work runs on a ("dp", "shard")
mesh (parallel/mesh.py): the index shards of one pass live on the shard
axis simultaneously, reads are data-parallel over dp, and survivors are
merged in shard-major order — the reference's sequential block loop,
parallelized without changing merge order. One device degenerates to the
sequential loop (identical math; tests assert equality).

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
from real_tpu.engine.matchstep import MatchState, initial_state, match_step
from real_tpu.index.build import build_index
from real_tpu.io import fasta, pipeline, reads as reads_io
from real_tpu.parallel import plan
from real_tpu.scoring.scoring import Scoring, score_tables
from real_tpu.text.packed import PackedText, build_packed_text

MAX_FRAGMENTS_PER_FILE = 1 << 16   # UniqueMatchInfo fragmentbits

# structured metrics of the last top-level run (SURVEY §5.5); the CLI
# serializes this with -metrics <path>
last_metrics: Dict[str, object] = {}


def _fetch_tree(tree, watchdog_s: float = 0, what: str = "device fetch"):
    """D2H fetch of a pytree: start ALL transfers async, then materialize.
    Synchronous per-buffer fetches pay a full round trip each on
    remote/tunneled devices (measured ~1s per buffer regardless of size);
    async-first pipelines them into one wait. With watchdog_s > 0 a
    wedged dispatch aborts the process loudly instead of blocking forever
    (utils/watchdog.py; SURVEY §5.3)."""
    from real_tpu.utils.watchdog import watchdog
    def _start(a):
        if hasattr(a, "copy_to_host_async"):
            a.copy_to_host_async()
        return a
    jax.tree.map(_start, tree)
    with watchdog(watchdog_s, what):
        return jax.tree.map(np.asarray, tree)


def _apply_debug_checks(cfg) -> None:
    """SURVEY §5.2: NaN/overflow debug checks behind a flag. Enables
    jax_debug_nans (every jit result is scanned for NaNs and the failing
    primitive re-run eagerly) for the rest of the process; off by
    default because it forces a device sync per dispatched computation."""
    if cfg.debug_checks and not jax.config.jax_debug_nans:
        jax.config.update("jax_debug_nans", True)


def validate_result(cfg, result: "MatchResult", texts) -> None:
    """Invariant assertions on a finished matchUnique result (-debug)."""
    st = result.st
    assert ((st >= 0) & (st <= 4)).all(), "state out of range"
    matched = (st == 1) | (st == 2)
    assert (result.errs[matched] <= cfg.totalkmax).all(), \
        "matched read exceeds totalkmax"
    assert (result.pos[matched] >= 0).all(), "negative match position"
    for fi in np.unique(result.fileid[matched]):
        n = texts[int(fi)].packed.n
        sel = matched & (result.fileid == fi)
        assert (result.pos[sel] < n).all(), "position beyond text"
    if cfg.scores:
        assert np.isfinite(result.score[matched]).all(), \
            "non-finite score on matched read"


def validate_hits(cfg, cols) -> None:
    """Invariant assertions on finished matchAll hit columns (-debug)."""
    pid, k, pos, fid, frag, score, inv = cols
    assert (k <= cfg.totalkmax).all(), "hit exceeds totalkmax"
    assert (pos >= 0).all(), "negative hit position"
    if cfg.scores:
        assert np.isfinite(score).all(), "non-finite hit score"


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


# largest per-text base count: positions are int32 on device (the
# reference's 35-bit UniqueMatchInfo position field handles up to 34 Gbp
# per file, UniqueMatchInfo.hpp:33 — bigger files are auto-split below)
TEXT_SPLIT_LIMIT = 2**31 - 64


def split_oversized(name: str, codes: np.ndarray,
                    ranges: List[Tuple[str, int]],
                    limit: int = TEXT_SPLIT_LIMIT):
    """Split one parsed text file into sub-texts of < limit bases at
    FRAGMENT boundaries. Alignments never cross fragment boundaries
    (RangeVector::isPositionValid, RangeVector.hpp:63-80), so matching a
    sub-text sequence is exact; output records are (fragment_id, local
    position), which are unchanged by the grouping. A single fragment
    larger than the limit cannot be split (no real chromosome is —
    GRCh38's largest is 248 Mbp)."""
    if len(codes) < limit:
        return [(name, codes, ranges)]
    names = [nm for nm, _ in ranges[:-1]]
    offs = [off for _, off in ranges]           # F+1 entries, last = n
    out = []
    i = 0
    while i < len(names):
        base = offs[i]
        j = i
        while j < len(names) and offs[j + 1] - base <= limit:
            j += 1
        if j == i:
            raise ValueError(
                f"fragment {names[i]!r} alone exceeds {limit} bases")
        sub = [(names[k], offs[k] - base) for k in range(i, j)]
        sub.append(("terminal", offs[j] - base))
        out.append((f"{name}#{len(out)}", codes[base:offs[j]], sub))
        i = j
    return out


def load_texts(cfg: RealConfig,
               split_limit: int = TEXT_SPLIT_LIMIT) -> List[TextFile]:
    """-t may be a file or a directory of *.fa files (getFileList.cpp).
    Files over 2^31 bases are auto-split at fragment boundaries."""
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
        for name, c, r in split_oversized(p, codes, ranges, split_limit):
            out.append(TextFile(name=name, packed=build_packed_text(c, r)))
    return out


def _build(cfg: RealConfig, text: PackedText, start: int, num_windows: int,
           bucket_bits: int = 0):
    if cfg.device_index_build:
        return build_index(text, cfg.seedl, start=start,
                           num_windows=num_windows, bucket_bits=bucket_bits)
    from real_tpu.index.hostbuild import build_index_host
    return build_index_host(text, cfg.seedl, start=start,
                            num_windows=num_windows)


def _shard_bounds(num_windows: int, num_shards: int) -> List[Tuple[int, int]]:
    from real_tpu.index.hostbuild import _round16
    per = _round16(-(-num_windows // num_shards))
    return [(s, min(s + per, num_windows))
            for s in range(0, num_windows, per)]


def _bsearch_steps_static(num_windows: int, cand_cap: int,
                          bucket_bits: int, extra: int = 0) -> int:
    """Static in-bucket binary-search depth for find_survivors, chosen on
    the HOST from the shard's window count and bucket width — no device
    sync.

    With per-shard bucket widths (index.build.pick_bucket_bits) mean
    occupancy stays ~1 up to 2^25-window shards, so the bucket range IS
    (almost always) the equal range and bisection is skipped — its 16
    gathers per probe measured ~38% of the whole match step. Safety does
    NOT depend on the heuristic: an unconverged bisection returns the
    conservative bounds (lower for begin, upper for end — see
    matchstep.find_survivors), so a deeper-than-planned bucket only
    over-approximates its candidate range, which at worst raises an
    overflow -> host rerun (reruns add 8 steps per depth); it can never
    silently drop a true hit."""
    occ = num_windows / float(1 << bucket_bits)
    # escalated caps (overflow reruns) must take the BISECTION path: the
    # lane path's [B, 12, K] tier arrays scale linearly with K, and a
    # deep-bucket rerun ladder (16x caps per depth) otherwise allocates
    # gigabytes per step by depth 3 (the skewed-bucket adversarial test
    # found exactly that); bisection resolves arbitrarily deep buckets
    # with log-depth gathers instead
    if extra == 0 and cand_cap <= 16 and occ <= 2.0 * max(cand_cap / 8.0, 1.0):
        return 0
    # depth for 8x the mean occupancy: Poisson tails stay within ~4x the
    # mean, and an unconverged bucket only raises overflow -> rerun
    # (never a silent miss)
    occ = max(8.0 * max(occ, 1.0), float(2 * cand_cap))
    steps = int(np.ceil(np.log2(occ + 1)))
    return min(-(-steps // 4) * 4 + extra, 30)


def _text_bytes(text: PackedText) -> int:
    return (text.words.nbytes + text.nbits.nbytes + text.ncum.nbytes
            + text.nb16.nbytes + text.ncum16.nbytes)


def _plan_shards(cfg: RealConfig, text: PackedText,
                 reserved_bytes: int = 0,
                 streaming: bool = False,
                 reads: int = 0) -> "plan.StreamShardPlan":
    """-shards override or the -f fracmem HBM planner. reserved_bytes
    must cover ALL device-resident texts, not just this one: split
    oversized files keep every sub-text uploaded for the whole run, and
    planning each against only its own footprint OOM'd the 3.1 Gbp
    config at the file transition.

    The pass-minimizing serial-build plan (plan_index_shards_streaming:
    bigger shards built without unit pipelining, wider bucket tables)
    applies when passes are expensive relative to builds — always when
    reads re-stream per pass (streaming=True), and for resident reads
    when the estimated per-pass match time dwarfs a serial shard's
    build time (config 4: 50M resident reads ~100 s/pass vs ~6 s/build
    -> 2 serial passes; config 5: 2M reads ~4 s/pass vs ~6 s/build ->
    keep the 2-in-flight pipelined plan whose build/match overlap wins)."""
    if cfg.index_shards > 0:
        return plan.StreamShardPlan(shards=cfg.index_shards,
                                    serial_build=False, bucket_bits_cap=25)
    num_windows = max(text.n - cfg.seedl + 1, 0)
    reserved = reserved_bytes or _text_bytes(text)
    splan = plan.plan_index_shards_streaming(num_windows, cfg.fracmem,
                                             reserved_bytes=reserved)
    if splan.serial_build and not streaming:
        match_pass_s = reads * plan.MATCH_S_PER_READ_PASS
        build_shard_s = (num_windows / max(splan.shards, 1)) \
            * plan.BUILD_S_PER_WINDOW
        if match_pass_s <= 3 * build_shard_s:
            splan = None
    elif not splan.serial_build:
        splan = None
    if splan is not None:
        return splan
    return plan.StreamShardPlan(
        shards=plan.plan_index_shards(num_windows, cfg.fracmem,
                                      reserved_bytes=reserved),
        serial_build=False, bucket_bits_cap=25)


def _step_kwargs(cfg, cand_cap, survivor_cap, score_mode, tables):
    return dict(tables=tables, seedl=cfg.seedl, seedkmax=cfg.seedkmax,
                totalkmax=cfg.totalkmax, cand_cap=cand_cap,
                survivor_cap=survivor_cap, scores=cfg.scores,
                score_mode=score_mode)


@dataclasses.dataclass
class MatchResult:
    """Final per-read state (host)."""
    st: np.ndarray
    pos: np.ndarray
    frag: np.ndarray
    fileid: np.ndarray
    errs: np.ndarray
    score: np.ndarray


def _text_usable(cfg: RealConfig, tf: TextFile, verbose: bool) -> bool:
    text = tf.packed
    if text.n < cfg.seedl:
        if verbose:
            print(f"File {tf.name} is too small for seed length, "
                  "skipping it.", file=sys.stderr)
        return False
    if text.num_fragments > MAX_FRAGMENTS_PER_FILE:
        if verbose:
            print(f"Number of fragments {text.num_fragments + 1} in file is "
                  "larger than limit we can handle, skipping it.",
                  file=sys.stderr)
        return False
    return True


class _DispatchWindow:
    """Bounds in-flight dispatched batches in streaming-read mode: without
    it, queued executions keep references to every uploaded batch of up to
    two whole units, defeating the streaming pipeline's HBM bound
    (io/pipeline.py). Syncing on the handle from `depth` batches ago keeps
    (depth + prefetch) batches alive at most while still overlapping
    upload, compute and the host loop."""

    def __init__(self, enabled: bool, depth: int = 4):
        self.enabled = enabled
        self.depth = depth
        self._window: List = []

    def push(self, handle) -> None:
        if not self.enabled or handle is None:
            return
        self._window.append(handle)
        if len(self._window) > self.depth:
            jax.block_until_ready(self._window.pop(0))


class _Progress:
    """stderr progress + per-phase timers (SURVEY §5.1/§5.5; the reference
    prints processed/numpat fractions and per-block sort/match timings,
    matchUniqueImplementation.cpp:1292, ListSetBlockReader.hpp:40-48)."""

    def __init__(self, enabled: bool):
        import time
        self.enabled = enabled
        self.t0 = time.perf_counter()
        self.phase_s: Dict[str, float] = {}

    def event(self, msg: str) -> None:
        if self.enabled:
            import time
            print(f"[{time.perf_counter() - self.t0:8.2f}s] {msg}",
                  file=sys.stderr, flush=True)

    def phase(self, name: str):
        import contextlib
        import time

        @contextlib.contextmanager
        def cm():
            t = time.perf_counter()
            yield
            dt = time.perf_counter() - t
            self.phase_s[name] = self.phase_s.get(name, 0.0) + dt
        return cm()

    def summary(self) -> None:
        if self.enabled and self.phase_s:
            parts = " ".join(f"{k}={v:.2f}s"
                             for k, v in sorted(self.phase_s.items()))
            print(f"phase timers: {parts}", file=sys.stderr, flush=True)


def _foreach_shard_seq(cfg: RealConfig, texts: List[TextFile], cand_cap,
                       visit, prog: Optional["_Progress"] = None,
                       skip_units: int = 0, extra_steps: int = 0,
                       index_cache: Optional[Dict] = None,
                       reads: int = 0, extra_reserved: int = 0,
                       exchange=None, streaming: bool = False):
    """Sequential (1-device) outer loop: for each text file and index
    shard, call visit(fi, text, index, bsearch_steps). The first
    skip_units (file, shard) units are skipped entirely (checkpoint
    resume) — their index builds never run.

    The loop never syncs with the device: builds and match steps are
    dispatched back-to-back, so the device pipelines shard s's matching
    with shard s+1's index build (the reference overlaps these with a
    reader thread + OpenMP team, matchUniqueImplementation.cpp:1253-1297).
    visit may return a sync handle (any device array of its last dispatch);
    at most 2 units are kept in flight so queued index buffers stay
    HBM-bounded.

    index_cache: a SINGLE-unit run parks its built index there so the
    overflow rerun (driver recursion) reuses it instead of re-sorting —
    the rebuild was ~4.5 s of a 332-read rerun at chr21 scale.
    Multi-unit runs never cache: holding extra multi-GB index shards
    alive through the pass loop raised HBM pressure enough to double a
    Drosophila shard pass (135 s -> 270 s), which dwarfs the rerun's
    rebuild cost."""
    prog = prog or _Progress(cfg.verbose)
    unit = 0
    inflight: List = []
    usable = [(fi, tf.packed) for fi, tf in enumerate(texts)
              if _text_usable(cfg, tf, verbose=True)]
    if exchange is not None:
        # every rank must derive the SAME shard plan (units are owned by
        # unit % nprocs): per-rank resident-read bytes differ slightly
        # across slices, so they are excluded from the planner here
        extra_reserved = 0
    all_text_bytes = sum(_text_bytes(t) for _, t in usable) + extra_reserved
    per_text = []
    for fi, text in usable:
        num_windows = text.n - cfg.seedl + 1
        splan = _plan_shards(cfg, text, reserved_bytes=all_text_bytes,
                             streaming=streaming, reads=reads)
        per_text.append((fi, text, _shard_bounds(num_windows, splan.shards),
                         splan))
    total_units = sum(len(b) for _, _, b, _ in per_text)
    if exchange is not None:
        # de-replicated build (multihost.BuildExchange): publish every
        # OWNED shard first so ranks build 1/P of the index in parallel,
        # then the visit loop below loads each unit (own or remote)
        from real_tpu.index.build import pick_bucket_bits
        u = 0
        with prog.phase("index_build"):
            for fi, text, bounds, splan in per_text:
                for s0, e0 in bounds:
                    u += 1
                    if u <= skip_units or not exchange.owns(u - 1):
                        continue
                    bbits = (pick_bucket_bits(cfg.seedl, e0 - s0, reads,
                                              cap=splan.bucket_bits_cap)
                             if cfg.device_index_build else 0)
                    idx = _build(cfg, text, start=s0, num_windows=e0 - s0,
                                 bucket_bits=bbits)
                    exchange.save(u - 1, idx)
                    del idx
    index = None
    for fi, text, bounds, splan in per_text:
        for si, (s, e) in enumerate(bounds):
            unit += 1
            if unit <= skip_units:
                continue
            # serial_build (streaming XXL shards): sync ALL queued work
            # and free the previous shard's lists BEFORE the next build
            # dispatches — peak HBM is then lists x2.2 (sort in+out)
            # instead of the pipelined x4, which is what lets the
            # planner halve the pass count (plan_index_shards_streaming)
            depth = 1 if splan.serial_build else 2
            while len(inflight) >= depth:
                jax.block_until_ready(inflight.pop(0))
            if splan.serial_build:
                index = None
            ck = (fi, s, e, cfg.seedl)
            cached = index_cache.get(ck) if index_cache is not None else None
            if cached is not None:
                index = cached
            elif exchange is not None:
                with prog.phase("index_load"):
                    index = exchange.load(unit - 1)
            else:
                from real_tpu.index.build import pick_bucket_bits
                bbits = (pick_bucket_bits(cfg.seedl, e - s, reads,
                                          cap=splan.bucket_bits_cap)
                         if cfg.device_index_build else 0)
                with prog.phase("index_build"):
                    index = _build(cfg, text, start=s, num_windows=e - s,
                                   bucket_bits=bbits)
                if index_cache is not None and total_units == 1:
                    index_cache[ck] = index
            steps = _bsearch_steps_static(e - s, cand_cap,
                                          index.bucket_bits, extra_steps)
            prog.event(f"file {fi}: index shard {si + 1}/{len(bounds)} "
                       f"dispatched ({e - s} windows, bsearch={steps}, "
                       f"bbits={index.bucket_bits})")
            with prog.phase("match"):
                handle = visit(fi, text, index, steps)
            if handle is not None:
                inflight.append(handle)


def _foreach_shard_mesh(cfg: RealConfig, texts: List[TextFile], cand_cap,
                        visit, prog: Optional["_Progress"] = None,
                        skip_units: int = 0, extra_steps: int = 0,
                        reads: int = 0, extra_reserved: int = 0):
    """Mesh outer loop: for each text file, build n_shard index shards at
    once per pass and call visit(fi, text, mesh, (sig_hi, sig, pos, bb),
    bsearch_steps). Sync-free dispatch with a 2-pass in-flight bound,
    like _foreach_shard_seq."""
    from real_tpu.index.build import pick_bucket_bits
    from real_tpu.index.hostbuild import _round16
    from real_tpu.parallel.mesh import build_sharded_index, make_mesh

    prog = prog or _Progress(cfg.verbose)
    n_dev = len(jax.local_devices())
    unit = 0
    inflight: List = []
    all_text_bytes = sum(_text_bytes(tf.packed) for tf in texts
                         if _text_usable(cfg, tf, verbose=False)) \
        + extra_reserved
    for fi, tf in enumerate(texts):
        if not _text_usable(cfg, tf, verbose=True):
            continue
        text = tf.packed
        num_windows = text.n - cfg.seedl + 1
        total_shards = _plan_shards(cfg, text,
                                    reserved_bytes=all_text_bytes).shards
        n_dp, n_shard = plan.choose_mesh_shape(n_dev, total_shards)
        mesh = make_mesh(n_dp, n_shard)
        rounds = -(-total_shards // n_shard)
        per_shard = _round16(-(-num_windows // (rounds * n_shard)))
        for r in range(rounds):
            start = r * n_shard * per_shard
            if start >= num_windows:
                break
            unit += 1
            if unit <= skip_units:
                continue
            while len(inflight) >= 2:
                jax.block_until_ready(inflight.pop(0))
            bbits = pick_bucket_bits(cfg.seedl, per_shard, reads)
            with prog.phase("index_build"):
                arrays = build_sharded_index(
                    text.words, text.nb16, text.ncum16, jnp.int32(text.n),
                    start, seedl=cfg.seedl, per_shard=per_shard, mesh=mesh,
                    order_sentinels=text.order_sentinels(cfg.seedl),
                    bucket_bits=bbits)
            steps = _bsearch_steps_static(per_shard, cand_cap, bbits,
                                          extra_steps)
            prog.event(f"file {fi}: index pass {r + 1}/{rounds} dispatched "
                       f"({n_shard} shards x {per_shard} windows, "
                       f"bsearch={steps}, bbits={bbits})")
            with prog.phase("match"):
                handle = visit(fi, text, mesh, arrays, steps, bbits)
            if handle is not None:
                inflight.append(handle)


def run_match_unique(cfg: RealConfig, rs: reads_io.ReadSet,
                     texts: List[TextFile],
                     score_mode: Optional[str] = None,
                     patid_filter: Optional[np.ndarray] = None,
                     cand_cap: Optional[int] = None,
                     survivor_cap: Optional[int] = None,
                     _depth: int = 0,
                     _index_cache: Optional[Dict] = None) -> MatchResult:
    score_mode = score_mode or default_score_mode()
    _apply_debug_checks(cfg)
    if _index_cache is None:
        _index_cache = {}
    cand_cap = cand_cap or cfg.cand_cap
    survivor_cap = survivor_cap or cfg.survivor_cap
    numpat = rs.num_reads
    n_dev = len(jax.local_devices())
    use_mesh = cfg.use_mesh if cfg.use_mesh is not None else n_dev > 1

    scoring = Scoring(cfg.similarity, cfg.gc, cfg.trans, cfg.err,
                      cfg.gcmut_bias)
    tables = score_tables(scoring) if cfg.scores else None
    # overflowing reads rerun host-side below with x16 caps per recursion
    # depth against a cached index (matchstep.scored_survivors docstring
    # records why the earlier device-side whole-batch escalation lost)
    kw = _step_kwargs(cfg, cand_cap, survivor_cap, score_mode, tables)

    result = MatchResult(
        st=np.zeros(numpat, np.int32), pos=np.zeros(numpat, np.int32),
        frag=np.zeros(numpat, np.int32), fileid=np.zeros(numpat, np.int32),
        errs=np.zeros(numpat, np.int32),
        score=np.full(numpat, -np.finfo(np.float32).max, np.float32))

    import time as _time
    _t_setup = _time.perf_counter()
    source = _make_source(cfg, rs, patid_filter,
                          row_align=n_dev if use_mesh else 1,
                          max_rows=512 if _depth else 0)
    plans = source.plans
    # bucket-width hint: the FULL read-set size, not the filtered stream
    # — warmup prefixes and overflow reruns must compile the SAME build
    # and step variants as the production run (a 32k warmup that picked
    # a narrower table pushed ~20 s of fresh compiles into the timed
    # chr21 run); genuinely small -p files still get narrow tables
    n_stream = rs.num_reads
    states: Dict[int, MatchState] = {
        bi: initial_state(p.rows) for bi, p in enumerate(plans)}
    overflow = np.zeros(numpat, bool)
    overflows: Dict[int, list] = {}
    prog = _Progress(cfg.verbose)
    prog.phase_s["setup"] = _time.perf_counter() - _t_setup
    done_reads = [0]
    every = max(1, len(plans) // 8)

    # checkpoint/resume (SURVEY §5.4): state = per-batch MatchState +
    # reduced overflow + completed-unit cursor; only the top-level pass
    # checkpoints (escalation reruns are cheap re-derivations)
    ck = None
    skip_units = 0
    unit_done = [0]
    if cfg.checkpoint and _depth == 0 and patid_filter is None:
        from real_tpu.engine import checkpoint as ckpt_mod
        fp = ckpt_mod.fingerprint(cfg, texts, numpat, len(plans),
                                  cand_cap, survivor_cap)
        ck = ckpt_mod.Checkpoint(cfg.checkpoint, fp)
        data = ck.load()
        if data:
            skip_units = unit_done[0] = data["units_done"]
            for bi in range(len(plans)):
                states[bi] = MatchState(**{
                    f: jnp.asarray(data["states"][bi][f])
                    for f in ("st", "pos", "frag", "fileid", "errs",
                              "score")})
                overflows[bi] = [jnp.asarray(data["overflow"][bi])]
            prog.event(f"resumed from checkpoint: {skip_units} units done")

    def checkpoint_unit():
        unit_done[0] += 1
        if ck is None or unit_done[0] % max(cfg.checkpoint_every, 1):
            return
        host_states = _fetch_tree([
            {f: getattr(states[bi], f)
             for f in ("st", "pos", "frag", "fileid", "errs", "score")}
            for bi in range(len(plans))],
            watchdog_s=cfg.watchdog_s, what="checkpoint state fetch")
        host_over = [
            np.asarray(functools.reduce(jnp.logical_or, overflows[bi]))
            if bi in overflows else np.zeros(plans[bi].rows, bool)
            for bi in range(len(plans))]
        ck.save(unit_done[0], host_states, host_over)
        prog.event(f"checkpoint saved ({unit_done[0]} units)")

    def tick(bi, b):
        # processed/numpat progress contract (the reference's
        # matchUniqueImplementation.cpp:1287-1293 stderr fraction)
        done_reads[0] += len(b.patids)
        if (bi + 1) % every == 0 or bi + 1 == len(plans):
            prog.event(f"  matched {done_reads[0]}/{numpat} reads "
                       f"({done_reads[0] / max(numpat, 1):.2f})")

    win = _DispatchWindow(enabled=not source.resident)

    if use_mesh:
        from real_tpu.parallel.mesh import sharded_match_step

        def visit(fi, text, mesh, arrays, steps, bbits):
            done_reads[0] = 0
            sig_hi, sig, pos, bb = arrays
            for bi, b in enumerate(source):
                eps = np.float32(cfg.filter_value(b.patl))
                states[bi], of = sharded_match_step(
                    sig, pos, bb,
                    text.words, text.nbits, text.ncum, text.frag_offsets,
                    b.codes, b.quals, b.valid,
                    states[bi], jnp.int32(fi), eps, sig_hi,
                    mesh=mesh, bsearch_steps=steps,
                    text_has_n=text.has_n, matchall=False, **kw)
                overflows.setdefault(bi, []).append(of)
                win.push(states[bi].st)
                tick(bi, b)
            checkpoint_unit()
            return states[len(plans) - 1].st if plans else None

        _foreach_shard_mesh(cfg, texts, cand_cap, visit, prog, skip_units,
                            reads=n_stream,
                            extra_reserved=source.resident_device_bytes)
    else:
        def visit(fi, text, index, steps):
            done_reads[0] = 0
            for bi, b in enumerate(source):
                eps = np.float32(cfg.filter_value(b.patl))
                states[bi], surv = match_step(
                    index.sig, index.pos, index.bb,
                    text.words, text.nbits, text.ncum, text.frag_offsets,
                    b.codes, b.quals, b.valid,
                    states[bi], jnp.int32(fi), eps, index.sig_hi,
                    matchall=False, bsearch_steps=steps,
                    text_has_n=text.has_n, **kw)
                overflows.setdefault(bi, []).append(surv.overflow)
                win.push(states[bi].st)
                tick(bi, b)
            checkpoint_unit()
            return states[len(plans) - 1].st if plans else None

        _foreach_shard_seq(cfg, texts, cand_cap, visit, prog, skip_units,
                           index_cache=_index_cache, reads=n_stream,
                           extra_reserved=source.resident_device_bytes,
                           exchange=_make_exchange(cfg, _depth),
                           streaming=not source.resident)

    # one synchronization for everything: start every per-batch fetch
    # async, then materialize (a device-side concat looked like "one
    # round trip" but its jit specializes on the PLAN COUNT — 2.9 s of
    # in-run compiles at 123 chr21 batches; the async-first tree fetch
    # pipelines the transfers just as well with zero compiles)
    allover = [functools.reduce(jnp.logical_or, overflows[bi])
               if bi in overflows else jnp.zeros(plans[bi].rows, bool)
               for bi in range(len(plans))]
    with prog.phase("drain"):
        # dispatch is sync-free, so queued device work from the whole
        # match phase completes inside this fetch — "drain" is the real
        # device-execution tail, "match" above only dispatch overhead
        st, over = _fetch_tree(
            ([states[bi] for bi in range(len(plans))], allover),
            watchdog_s=cfg.watchdog_s, what="matchUnique result drain")
    collect_cm = prog.phase("collect")
    collect_cm.__enter__()
    for bi, p in enumerate(plans):
        n = len(p.patids)
        result.st[p.patids] = st[bi].st[:n]
        result.pos[p.patids] = st[bi].pos[:n]
        result.frag[p.patids] = st[bi].frag[:n]
        result.fileid[p.patids] = st[bi].fileid[:n]
        result.errs[p.patids] = st[bi].errs[:n]
        result.score[p.patids] = st[bi].score[:n]
        overflow[p.patids[over[bi][:n]]] = True
    collect_cm.__exit__(None, None, None)

    prog.summary()
    over_ids = np.flatnonzero(overflow)
    if _depth == 0:
        last_metrics.clear()
        last_metrics.update({
            "phase_s": {k: round(v, 3) for k, v in prog.phase_s.items()},
            "overflow_rerun_reads": int(len(over_ids))})
    if len(over_ids):
        if _depth >= 4:
            raise RuntimeError(
                f"{len(over_ids)} reads overflow candidate caps even at "
                f"cand_cap={cand_cap}")
        print(f"rerunning {len(over_ids)} overflowing reads with "
              f"cand_cap={cand_cap * 16}", file=sys.stderr)
        sub = run_match_unique(
            cfg, rs, texts, score_mode=score_mode, patid_filter=over_ids,
            cand_cap=cand_cap * 16, survivor_cap=survivor_cap * 16,
            _depth=_depth + 1, _index_cache=_index_cache)
        for f in ("st", "pos", "frag", "fileid", "errs", "score"):
            getattr(result, f)[over_ids] = getattr(sub, f)[over_ids]
    if ck is not None:
        ck.delete()
    if cfg.debug_checks and _depth == 0:
        validate_result(cfg, result, texts)
    return result


def _make_exchange(cfg: RealConfig, depth: int):
    """BuildExchange when -exchange <dir> is set in a multi-process job
    (top-level pass only; overflow reruns rebuild their tiny narrow
    shards locally)."""
    if not cfg.build_exchange_dir or depth:
        return None
    import jax as _jax
    if _jax.process_count() <= 1:
        return None
    from real_tpu.parallel.multihost import BuildExchange, HostTopology
    return BuildExchange(cfg.build_exchange_dir,
                         HostTopology(_jax.process_index(),
                                      _jax.process_count()))


def _make_source(cfg: RealConfig, rs: reads_io.ReadSet,
                 patid_filter: Optional[np.ndarray],
                 row_align: int = 1,
                 max_rows: int = 0) -> pipeline.BatchSource:
    """Length-bucketed batch source: resident (one bulk upload, reused
    across shard passes) when the packed reads fit the HBM budget,
    else a streaming prefetch pipeline (io/pipeline.py)."""
    budget = cfg.resident_reads_bytes
    if budget <= 0:
        # packed reads are ~28 B per 100bp read (2-bit words + valid), so
        # 12% of HBM holds ~70M reads resident — residency removes the
        # per-pass re-upload entirely (the tunneled v5e link measured
        # ~40 MB/s; config 4's u8 re-stream was ~90 s per pass in r4)
        budget = int(0.12 * plan.hbm_bytes_per_device())
    return pipeline.make_source(
        rs, cfg.batch_size, cfg.seedl, patid_filter, row_align,
        warn=lambda m: print(m, file=sys.stderr),
        resident_budget_bytes=budget, max_rows=max_rows)


# ---------------------------------------------------------------------------
# matchAll
# ---------------------------------------------------------------------------

class _HitAccumulator:
    """Vectorized hit collection: np.nonzero per step (no per-read Python
    loop), one global lexsort + dedup at the end
    (matchAllImplementation.cpp:99-161 'unifyMatches' semantics)."""

    def __init__(self) -> None:
        self.cols: List[Tuple[np.ndarray, ...]] = []
        # steps whose TOTAL hit count exceeded the device buffer H — the
        # whole batch gets rerun (compact_hits docstring); counted for
        # -metrics so rerun thrash on repeat genomes is visible
        self.batch_overflow_steps = 0

    def add_compact(self, ch, patids: np.ndarray, fi: int, n: int,
                    overflow_out: np.ndarray) -> None:
        """Decode one step's device-compacted hits (matchstep.CompactHits
        fetched to numpy; the mesh path concatenates per-dp slices, so
        `count` may be a vector and row ids are slice-local)."""
        overflow_out[patids[ch.overflow[:n]]] = True
        counts = np.atleast_1d(np.asarray(ch.count))
        self.batch_overflow_steps += int((counts > len(ch.pos)
                                          // len(counts)).sum())
        ndp = len(counts)
        H = len(ch.pos) // ndp
        b_loc = len(ch.overflow) // ndp
        for d in range(ndp):
            c = int(min(counts[d], H))
            if c == 0:
                continue
            sl = slice(d * H, d * H + c)
            rows = (ch.m1[sl] >> 4) + d * b_loc
            keep = rows < n            # padded rows never produce hits
            rows = rows[keep]
            if rows.size == 0:
                continue
            self.cols.append((
                patids[rows].astype(np.int64),
                (ch.m1[sl][keep] & 15).astype(np.int64),
                ch.pos[sl][keep].astype(np.int64),
                np.full(rows.size, fi, np.int64),
                (ch.m2[sl][keep] >> 1).astype(np.int64),
                ch.score[sl][keep].astype(np.float32),
                (ch.m2[sl][keep] & 1).astype(bool)))

    _EMPTY = tuple(np.zeros(0, dt) for dt in
                   (np.int64, np.int64, np.int64, np.int64, np.int64,
                    np.float32, bool))

    def compact(self) -> tuple:
        """Concatenate accumulated columns in place (no sort/dedup) —
        checkpoint payload; keeps the accumulator equivalent."""
        if not self.cols:
            return self._EMPTY
        cols = tuple(np.concatenate([c[i] for c in self.cols])
                     for i in range(7))
        self.cols = [cols]
        return cols

    def finalize_arrays(self) -> tuple:
        """Sorted + deduped hit columns
        (pid, k, pos, fileid, frag, score, inv)."""
        if not self.cols:
            return self._EMPTY
        cols = tuple(np.concatenate([c[i] for c in self.cols])
                     for i in range(7))
        return _sort_dedup_hits(cols)

    def finalize(self) -> Dict[int, List[tuple]]:
        pid, k, pos, fid, frag, score, inv = self.finalize_arrays()
        out: Dict[int, List[tuple]] = {}
        if len(pid) == 0:
            return out
        bounds = np.flatnonzero(np.diff(pid)) + 1
        starts = np.concatenate([[0], bounds])
        ends = np.concatenate([bounds, [len(pid)]])
        for s, e in zip(starts, ends):
            out[int(pid[s])] = [
                (int(k[i]), int(pos[i]), int(fid[i]), int(frag[i]),
                 float(score[i]), bool(inv[i])) for i in range(s, e)]
        return out


def _radix_argsort3(p1: np.ndarray, p2: np.ndarray,
                    p3: np.ndarray) -> Optional[np.ndarray]:
    """Native stable LSD radix argsort by (p3, p2, p1) composite order
    (native/readpack.cpp radix_argsort3); None if the lib is missing."""
    import ctypes

    from real_tpu import native
    lib = native.get_lib()
    if lib is None:
        return None
    n = len(p1)
    out = np.empty(n, np.int64)
    # keep the contiguous buffers alive across the call
    a1 = np.ascontiguousarray(p1, np.uint64)
    a2 = np.ascontiguousarray(p2, np.uint64)
    a3 = np.ascontiguousarray(p3, np.uint64)
    u64p = ctypes.POINTER(ctypes.c_uint64)
    lib.radix_argsort3(n, a1.ctypes.data_as(u64p), a2.ctypes.data_as(u64p),
                       a3.ctypes.data_as(u64p),
                       out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    return out


def _sort_dedup_hits(cols: tuple) -> tuple:
    """Sort by (pid; k, pos, fileid, frag, score, inv) — the reference's
    MatchPosAndError ordering (matchAllImplementation.cpp:121-148) — and
    dedup identical consecutive records (unifyMatches :150-161).

    The 7-key comparator collapses to THREE composite-uint64 stable
    passes (LSD order): frag is a pure function of (fid, pos) — equal
    whenever the earlier keys tie — so it never decides; score/inv only
    decide among same-(pid, k, pos, fid) strand pairs. A 7-key np.lexsort
    measured ~18 s on 5M hits; the 3-pass form is ~6x faster and exact
    (cross-checked in tests/test_completeness.py)."""
    pid, k, pos, fid, frag, score, inv = cols
    if len(pid) and (int(pid.max()) >= 1 << 60 or int(fid.max()) >= 1 << 16
                     or int(pos.max()) >= 1 << 31):
        order = np.lexsort((inv, score, frag, fid, pos, k, pid))
    else:
        # +0.0 so -0.0 keys equal to +0.0 (float compare semantics);
        # order-preserving f32->u32: flip sign bit (+) / all bits (-)
        u32 = (score.astype(np.float32) + np.float32(0.0)).view(np.uint32)
        flip = ((u32.view(np.int32) >> 31).view(np.uint32)
                & np.uint32(0x7FFFFFFF)) | np.uint32(0x80000000)
        p1 = (u32 ^ flip).astype(np.uint64)
        p1 <<= 1
        p1 |= inv
        p2 = pos.astype(np.uint64, copy=True)
        p2 <<= 16
        p2 |= fid.astype(np.uint64, copy=False)
        p3 = pid.astype(np.uint64, copy=True)
        p3 <<= 4
        p3 |= k.astype(np.uint64, copy=False)
        order = _radix_argsort3(p1, p2, p3)
        if order is None:
            order = np.argsort(p1, kind="stable")
            order = order[np.argsort(p2[order], kind="stable")]
            order = order[np.argsort(p3[order], kind="stable")]
    pid, k, pos, fid, frag, score, inv = (
        a[order] for a in (pid, k, pos, fid, frag, score, inv))
    keep = np.ones(len(pid), bool)
    if len(pid) > 1:
        same = ((pid[1:] == pid[:-1]) & (k[1:] == k[:-1])
                & (pos[1:] == pos[:-1]) & (fid[1:] == fid[:-1])
                & (frag[1:] == frag[:-1]) & (score[1:] == score[:-1])
                & (inv[1:] == inv[:-1]))
        keep[1:] = ~same
    return tuple(a[keep] for a in (pid, k, pos, fid, frag, score, inv))


def run_match_all(cfg: RealConfig, rs: reads_io.ReadSet,
                  texts: List[TextFile],
                  score_mode: Optional[str] = None,
                  patid_filter: Optional[np.ndarray] = None,
                  cand_cap: Optional[int] = None,
                  survivor_cap: Optional[int] = None,
                  as_arrays: bool = False,
                  _depth: int = 0,
                  _index_cache: Optional[Dict] = None):
    """Collect every qualifying hit per read.

    Returns {patid: [(k, pos, fileid, frag, score, inverted), ...]} deduped
    and sorted by the reference's MatchPosAndError ordering
    (matchAllImplementation.cpp:121-160) — or, with as_arrays=True, the
    equivalent sorted column arrays (pid, k, pos, fileid, frag, score, inv)
    (no per-hit Python objects; use cli.output.write_all_arrays)."""
    score_mode = score_mode or default_score_mode()
    cand_cap = cand_cap or cfg.cand_cap
    survivor_cap = survivor_cap or cfg.survivor_cap
    if _index_cache is None:
        _index_cache = {}
    _apply_debug_checks(cfg)
    n_dev = len(jax.local_devices())
    use_mesh = cfg.use_mesh if cfg.use_mesh is not None else n_dev > 1

    scoring = Scoring(cfg.similarity, cfg.gc, cfg.trans, cfg.err,
                      cfg.gcmut_bias)
    tables = score_tables(scoring) if cfg.scores else None
    kw = _step_kwargs(cfg, cand_cap, survivor_cap, score_mode, tables)

    source = _make_source(cfg, rs, patid_filter,
                          row_align=n_dev if use_mesh else 1,
                          max_rows=512 if _depth else 0)
    n_stream = rs.num_reads     # see run_match_unique: variant stability
    overflow = np.zeros(rs.num_reads, bool)
    dummy_states = {bi: initial_state(p.rows)
                    for bi, p in enumerate(source.plans)}
    acc = _HitAccumulator()
    prog = _Progress(cfg.verbose)
    nplans = len(source.plans)
    every = max(1, nplans // 8)
    done_reads = [0]

    # Survivors are fetched INCREMENTALLY with bounded in-flight depth:
    # the D2H copy starts asynchronously right after each dispatch and is
    # materialized once `_PENDING_MAX` newer batches are queued, so the
    # transfer overlaps device compute, device buffers are freed as the
    # run progresses (HBM use is bounded instead of growing with
    # passes x batches), and host accumulation happens on the fly. The
    # reference prints hits per block inside the worker loop
    # (matchAllImplementation.cpp:467-533) — same streaming idea.
    _PENDING_MAX = 8
    pending: List[tuple] = []

    def _start_fetch(tree):
        jax.tree.map(lambda a: a.copy_to_host_async()
                     if hasattr(a, "copy_to_host_async") else None, tree)

    def drain(to_len: int) -> None:
        from real_tpu.utils.watchdog import watchdog
        while len(pending) > to_len:
            ch, patids, fi, n = pending.pop(0)
            with watchdog(cfg.watchdog_s, "matchAll hit drain"):
                hs = jax.tree.map(np.asarray, ch)
            acc.add_compact(hs, patids, fi, n, overflow)

    def enqueue(surv, b, fi, bi) -> None:
        _start_fetch(surv)
        pending.append((surv, b.patids, fi, len(b.patids)))
        drain(_PENDING_MAX)
        done_reads[0] += len(b.patids)
        if (bi + 1) % every == 0 or bi + 1 == nplans:
            prog.event(f"  matched {done_reads[0]}/{rs.num_reads} reads "
                       f"({done_reads[0] / max(rs.num_reads, 1):.2f})")

    # checkpoint/resume (SURVEY §5.4): accumulated hit columns + overflow
    # + completed-unit cursor (hits of completed units are independent of
    # later units — shards are disjoint window ranges)
    ck = None
    skip_units = 0
    unit_done = [0]
    if cfg.checkpoint and _depth == 0 and patid_filter is None:
        from real_tpu.engine import checkpoint as ckpt_mod
        fp = "all-" + ckpt_mod.fingerprint(cfg, texts, rs.num_reads,
                                           nplans, cand_cap, survivor_cap)
        ck = ckpt_mod.AllCheckpoint(cfg.checkpoint, fp)
        data = ck.load()
        if data:
            skip_units = unit_done[0] = data["units_done"]
            overflow |= data["overflow"]
            acc.cols.append(data["cols"])
            prog.event(f"resumed from checkpoint: {skip_units} units done")

    def checkpoint_unit():
        unit_done[0] += 1
        if ck is None or unit_done[0] % max(cfg.checkpoint_every, 1):
            return
        drain(0)
        ck.save(unit_done[0], overflow, acc.compact())
        prog.event(f"checkpoint saved ({unit_done[0]} units)")

    if use_mesh:
        from real_tpu.parallel.mesh import sharded_match_step

        def visit(fi, text, mesh, arrays, steps, bbits):
            done_reads[0] = 0
            sig_hi, sig, pos, bb = arrays
            seq = None
            for bi, b in enumerate(source):
                eps = np.float32(cfg.filter_value(b.patl))
                _, seq = sharded_match_step(
                    sig, pos, bb,
                    text.words, text.nbits, text.ncum, text.frag_offsets,
                    b.codes, b.quals, b.valid,
                    dummy_states[bi], jnp.int32(fi), eps, sig_hi,
                    mesh=mesh, bsearch_steps=steps,
                    text_has_n=text.has_n, matchall=True, **kw)
                enqueue(seq, b, fi, bi)
            checkpoint_unit()
            return seq.pos if seq is not None else None

        _foreach_shard_mesh(cfg, texts, cand_cap, visit, prog, skip_units,
                            reads=n_stream,
                            extra_reserved=source.resident_device_bytes)
    else:
        def visit(fi, text, index, steps):
            done_reads[0] = 0
            surv = None
            for bi, b in enumerate(source):
                eps = np.float32(cfg.filter_value(b.patl))
                _, surv = match_step(
                    index.sig, index.pos, index.bb,
                    text.words, text.nbits, text.ncum, text.frag_offsets,
                    b.codes, b.quals, b.valid,
                    dummy_states[bi], jnp.int32(fi), eps, index.sig_hi,
                    matchall=True, bsearch_steps=steps,
                    text_has_n=text.has_n, **kw)
                enqueue(surv, b, fi, bi)
            checkpoint_unit()
            return surv.pos if surv is not None else None

        _foreach_shard_seq(cfg, texts, cand_cap, visit, prog, skip_units,
                           index_cache=_index_cache, reads=n_stream,
                           extra_reserved=source.resident_device_bytes,
                           exchange=_make_exchange(cfg, _depth),
                           streaming=not source.resident)

    with prog.phase("drain"):
        drain(0)

    over_ids = np.flatnonzero(overflow)
    if as_arrays:
        with prog.phase("finalize"):
            cols = acc.finalize_arrays()
        prog.summary()
        if _depth == 0:
            last_metrics.clear()
            last_metrics.update({
                "phase_s": {k: round(v, 3) for k, v in prog.phase_s.items()},
                "overflow_rerun_reads": int(len(over_ids)),
                "batch_hit_overflow_steps": acc.batch_overflow_steps})
        if len(over_ids):
            if _depth >= 4:
                raise RuntimeError(
                    "matchAll overflow beyond escalation limit")
            sub = run_match_all(cfg, rs, texts, score_mode=score_mode,
                                patid_filter=over_ids,
                                cand_cap=cand_cap * 16,
                                survivor_cap=survivor_cap * 16,
                                as_arrays=True, _depth=_depth + 1,
                                _index_cache=_index_cache)
            keep = ~np.isin(cols[0], over_ids)
            cols = _sort_dedup_hits(tuple(
                np.concatenate([a[keep], b]) for a, b in zip(cols, sub)))
        if ck is not None:
            ck.delete()
        if cfg.debug_checks and _depth == 0:
            validate_hits(cfg, cols)
        return cols

    prog.summary()
    if _depth == 0:
        last_metrics.clear()
        last_metrics.update({
            "phase_s": {k: round(v, 3) for k, v in prog.phase_s.items()},
            "overflow_rerun_reads": int(len(over_ids)),
            "batch_hit_overflow_steps": acc.batch_overflow_steps})
    hits = acc.finalize()
    if len(over_ids):
        if _depth >= 4:
            raise RuntimeError("matchAll overflow beyond escalation limit")
        sub = run_match_all(cfg, rs, texts, score_mode=score_mode,
                            patid_filter=over_ids, cand_cap=cand_cap * 16,
                            survivor_cap=survivor_cap * 16, _depth=_depth + 1,
                            _index_cache=_index_cache)
        for pid in over_ids:
            hits[int(pid)] = sub.get(int(pid), [])
            if not hits[int(pid)]:
                del hits[int(pid)]
    if ck is not None:
        ck.delete()
    return hits
